package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val probe = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "v")
    val build = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, Seq("k")).orderBy("k", "v")
    val salted = Salting.saltedJoin(probe, build, "k", buckets = 8, tiebreak = "v")
      .orderBy("k", "v")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join spreads the hot key over multiple partitions' worth of salts") {
    val probe = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = probe.select(Salting.salt(col("v"), 8)).distinct().count()
    assert(salts == 8)
  }

  test("two-phase count requires sum as the merge phase") {
    val df = ((1 to 500).map(i => (1L, i.toLong)) ++ (1 to 50).map(i => (2L, i.toLong)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    val twoPhase = Salting
      .twoPhaseAgg(df, "k", "v", 8, c => count(c), c => sum(c), "v", "n")
      .orderBy("k")
    assert(twoPhase.collect().toSeq == direct.collect().toSeq)
  }

  test("salted join shuffles on (key, salt), not the key alone — the hot key actually spreads") {
    // plan pin for the skew story: if a refactor dropped __salt from
    // the join key, the salted path would silently re-concentrate the
    // hot key on one reducer while still returning correct rows.
    val probe = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val build = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Salting.saltedJoin(probe, build, "k", buckets = 8, tiebreak = "v")
      val plan = salted.queryExecution.executedPlan.toString
      val saltedExchanges = plan.split("\n")
        .filter(l => l.contains("hashpartitioning") && l.contains("__salt"))
      assert(saltedExchanges.length >= 2,
        s"expected both join sides to exchange on (k, __salt); plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("two-phase aggregate equals direct aggregate") {
    val df = ((1 to 500).map(i => (1L, i.toLong)) ++ (1 to 50).map(i => (2L, i.toLong)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("total")).orderBy("k")
    val twoPhase = Salting.twoPhaseAgg(df, "k", "v", 8, sum, sum, "v", "total").orderBy("k")
    assert(twoPhase.collect().toSeq == direct.collect().toSeq)
  }
}
