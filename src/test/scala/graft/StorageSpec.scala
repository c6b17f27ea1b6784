package graft

import org.apache.spark.sql.functions._

/** Storage-layout capabilities that carry the 100 TB design: partition
  * pruning on partitioned writes, shuffle-free joins on bucketed
  * tables, and non-parquet format round-trips.
  */
class StorageSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  test("partitionBy write + partition pruning: pruned scan reads one partition") {
    val path = tmp("part_writes")
    Tables.orders(spark, sf0001)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(path)

    val pruned = spark.read.parquet(path).filter(col("order_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter, not a data filter: no row-level predicate needed
    assert(pruned.count() ==
      Tables.orders(spark, sf0001).filter(year(col("o_orderdate")) === 1997).count())
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("order_year"))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // warehouse dir is a static conf, set via -Dspark.sql.warehouse.dir
    // in build.sbt (out-of-repo temp location)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.orders(spark, sf0001)
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf0001)
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 0, "bucketed join must not shuffle")
      assert(joined.count() == 6000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("orc round-trip preserves values and pushes filters") {
    val src = Tables.orders(spark, sf0001)
    val orcPath = tmp("orc_rt")
    src.write.orc(orcPath)
    val back = spark.read.orc(orcPath)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      src.orderBy("o_orderkey").collect().toSeq)
    val filtered = back.filter(col("o_totalprice") > 400000.0)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_totalprice"))
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    // a long-lived table gains a column mid-life; old files lack it.
    // mergeSchema must union the schemas and NULL-fill the old files —
    // the read-side contract that lets a 100 TB table evolve without
    // rewriting history.
    val path = tmp("evolve")
    val docs = Tables.documents(spark, sf0001)
    docs.select("doc_id", "n_chars").write.parquet(path)
    docs.select(col("doc_id") + 1000000L as "doc_id", col("n_chars"),
        col("lang")) // the new generation carries an extra column
      .write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(merged.count() == 2 * docs.count())
    // old generation reads as NULL lang; new generation keeps values
    assert(merged.filter(col("doc_id") < 1000000L && col("lang").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") >= 1000000L && col("lang").isNull).count() == 0)
  }

  test("csv and json round-trips preserve values") {
    val src = Tables.supplier(spark, sf0001)
    val csvPath = tmp("csv_rt")
    src.write.option("header", "true").csv(csvPath)
    val csvBack = spark.read.option("header", "true").schema(src.schema).csv(csvPath)
    assert(csvBack.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)

    val jsonPath = tmp("json_rt")
    src.write.json(jsonPath)
    val jsonBack = spark.read.schema(src.schema).json(jsonPath)
    assert(jsonBack.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
  }
}
