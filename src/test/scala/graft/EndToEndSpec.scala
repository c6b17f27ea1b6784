package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationQueries, DedupQueries}

/** The full curation pipeline composed the way a user would run it:
  * quality gate -> near-dup dedup -> leakage-safe split -> sequence
  * packing -> per-source quota. Each operator is individually
  * oracle-checked; this spec pins the CROSS-OPERATOR invariants that
  * only show up when they are chained.
  */
class EndToEndSpec extends SparkSpec {

  test("curation chain conserves documents and every stage's contract holds") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "source")
    val n = docs.count()

    // 1. quality gate: filter-with-reasons covers the corpus
    val gate = CurationQueries.qualityGate(spark, sf0001)
      .select(col("doc_id"), col("keep"))
    assert(gate.count() == n)
    val kept = gate.filter(col("keep"))
    assert(kept.count() > 0 && kept.count() < n)

    // 2. dedup survivors of the kept set: survivors ⊆ kept, and no
    // surviving pair is a known near-dup (cluster minima only)
    val survivors = kept.join(
      DedupQueries.dedupKeep(spark, sf0001).select("doc_id"), Seq("doc_id"))
    assert(survivors.count() <= kept.count())
    val labels = DedupQueries.dedupClusters(spark, sf0001)
    val nonMinima = labels.filter(col("doc_id") =!= col("cluster_id"))
    assert(survivors.join(nonMinima, Seq("doc_id")).count() == 0)

    // 3. split partitions the survivors; chained filters preserve the
    // no-straddle property trivially (subset of a partition)
    val split = CurationQueries.leakSafeSplit(spark, sf0001)
      .join(survivors, Seq("doc_id"))
    assert(split.count() == survivors.count())
    val train = split.filter(col("split") === "train").select("doc_id")
    assert(train.count() > 0)

    // 4. packing the training slice: offsets over the FULL corpus
    // restricted to train stay strictly increasing in doc_id order
    // (a monotone subsequence of the global token stream)
    val packed = CurationQueries.pack(spark, sf0001)
      .join(train, Seq("doc_id")).orderBy("doc_id").collect()
    assert(packed.nonEmpty)
    var prevEnd = -1L
    packed.foreach { r =>
      val off = r.getAs[Long]("offset")
      assert(off > prevEnd, s"offset regressed at doc ${r.getAs[Long]("doc_id")}")
      prevEnd = off + r.getAs[Long]("n_tok") - 1
    }

    // 5. quota over the train slice: kept tokens per source within
    // budget even after the upstream filters (prefix-cap is computed
    // on the full corpus, so chaining can only reduce usage)
    val quota = CurationQueries.quota(spark, sf0001).join(train, Seq("doc_id"))
    val overBudget = quota.filter(col("kept"))
      .groupBy("source").agg(sum(col("n_tok")).as("tok"))
      .filter(col("tok") > 2000L)
    assert(overBudget.count() == 0)
  }

  test("dedup end-products agree: keep + cluster_stats + clusters tell one story") {
    val n = Tables.documents(spark, sf0001).count()
    val keepN = DedupQueries.dedupKeep(spark, sf0001).count()
    val stats = DedupQueries.clusterStats(spark, sf0001)
      .agg(sum(col("n_removed")).as("removed"), sum(col("n_docs")).as("clustered"),
        count(lit(1)).as("n_clusters"))
      .head()
    val labels = DedupQueries.dedupClusters(spark, sf0001)
    // every clustered doc is labeled; removed = clustered - clusters
    assert(stats.getAs[Long]("clustered") == labels.count())
    assert(stats.getAs[Long]("removed") ==
      stats.getAs[Long]("clustered") - stats.getAs[Long]("n_clusters"))
    // the kept corpus is everything minus the removed docs
    assert(keepN == n - stats.getAs[Long]("removed"))
  }
}
