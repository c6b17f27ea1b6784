package graft

import org.apache.spark.sql.SparkSession

/** Dev utility main (not part of the driver contract).
  *
  * Usage (via scripts/run.sh graft.Dev ...):
  *   schema <table> <sfDir>      — print the Spark-side schema
  *   show <query> <sfDir> [n]    — run a SparkEntry query, show n rows
  *   explain <query> <sfDir>     — formatted physical plan of a query
  *   explainAll <sfDir>          — formatted plans for every query
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-dev")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args.toList match {
      case "schema" :: table :: dir :: Nil =>
        val df = table match {
          case "events" => Tables.events(spark, dir)
          case t        => Tables.read(spark, dir, t)
        }
        df.printSchema()
        df.show(5, truncate = false)
      case "show" :: q :: dir :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(20)
        SparkEntry.queries(q)(spark, dir).show(n, truncate = false)
      case "explain" :: q :: dir :: Nil =>
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      case "explainAll" :: dir :: Nil =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          println(s"\n========== $name ==========")
          fn(spark, dir).explain("formatted")
        }
      case "stream" :: op :: dir :: Nil =>
        import graft.streaming.StreamingOps
        val events = StreamingOps.eventStream(spark, dir)
        val df = op match {
          case "windows"  => StreamingOps.windowedCounts(events)
          case "sessions" => StreamingOps.sessionCounts(events)
          case "dedup"    => StreamingOps.dedupWithinWatermark(events)
          case "totals"   => StreamingOps.userRunningTotals(spark, events).toDF()
        }
        val mode = if (op == "dedup") "append" else if (op == "totals") "update" else "complete"
        val q = df.writeStream.outputMode(mode).format("memory").queryName("dev_stream").start()
        q.processAllAvailable()
        q.stop()
        val out = spark.table("dev_stream")
        println(s"rows: ${out.count()}")
        out.show(10, truncate = false)
      case other =>
        System.err.println(s"unknown args: $other")
        sys.exit(2)
    } finally spark.stop()
  }
}
