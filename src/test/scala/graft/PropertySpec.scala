package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.{IncrementalFilter, Upsert}

/** Property-based invariants (SURVEY §5.3), using plain ScalaCheck
  * generators with fixed seeds (the scalatest-scalacheck bridge is not
  * in the offline dependency cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0, 8), Gen.alphaLowerStr.map(_.take(4))))

  private def samples(n: Int): Seq[(List[(Int, String)], List[(Int, String)])] =
    (0 until n).map { i =>
      val s1 = rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val s2 = rowsGen.apply(Gen.Parameters.default, Seed(1000L + i)).getOrElse(Nil)
      (s1, s2)
    }

  test("upsert idempotence: upsert(upsert(s,u),u) == upsert(s,u)") {
    samples(8).foreach { case (b, u) =>
      val base = b.toDF("id", "s").dropDuplicates("id")
      val ups = u.toDF("id", "s").dropDuplicates("id")
      val once = Upsert(base, ups, Seq("id"))
      val twice = Upsert(once, ups, Seq("id"))
      assert(once.orderBy("id", "s").collect().toSeq ==
        twice.orderBy("id", "s").collect().toSeq)
    }
  }

  test("upsert result PKs = base PKs union update PKs") {
    samples(8).foreach { case (b, u) =>
      val base = b.toDF("id", "s").dropDuplicates("id")
      val ups = u.toDF("id", "s").dropDuplicates("id")
      val got = Upsert(base, ups, Seq("id")).select("id").as[Int].collect().toSet
      assert(got == (b.map(_._1).toSet ++ u.map(_._1).toSet))
    }
  }

  test("incremental filter output ⊆ candidates and is disjoint from recent keys") {
    samples(8).foreach { case (c, r) =>
      val cand = c.map(_._2).toDF("k")
      val recent = r.map(_._2).toDF("k")
      val out = IncrementalFilter(cand, recent, "k", "k").as[String].collect().toSet
      assert(out.subsetOf(c.map(_._2).toSet))
      assert(out.map(_.toLowerCase).intersect(r.map(_._2.toLowerCase).toSet).isEmpty)
    }
  }

  test("rank is within [1, partition size] and starts at 1") {
    val rk = graft.operators.OperatorCatalog.rankWindow(spark, sf0001)
    import org.apache.spark.sql.functions._
    val bad = rk.groupBy("c_mktsegment")
      .agg(max("rk").as("max_rk"), count(lit(1)).as("n"), min("rk").as("min_rk"))
      .filter(col("max_rk") > col("n") || col("min_rk") =!= 1)
    assert(bad.count() == 0)
  }
}
