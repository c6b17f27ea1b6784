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
      case other =>
        System.err.println(s"unknown args: $other")
        sys.exit(2)
    } finally spark.stop()
  }
}
