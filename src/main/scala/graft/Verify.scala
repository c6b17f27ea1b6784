package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Driver contract: exactly (sfDir, outDir). Extra args are a
    // dev-only query-name filter for fast single-query iteration.
    val Array(sfDir, outDir, only @ _*) = args: @unchecked
    // Default to every core; SPARK_GRAFT_CPUS overrides for experiments.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_MASTER overrides the default local[cpus] — see
    // SessionEnv for the local-cluster (multi-JVM) wiring; shuffle
    // partitions stay at the session's thread/core count either way.
    val spark = SessionEnv.builder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val retried = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      // One retry: a transient failure (an executor hiccup, a race in
      // some cached build) must not zero a query in the driver's
      // correctness gate — the result is deterministic, so a clean
      // second run is as valid as a clean first. Persistent failures
      // still fail (and print both attempts). Every retry is recorded
      // in retried.json: a pass-on-second-attempt is a FLAKE the
      // machine-readable artifact must surface (the round-5
      // computeIfAbsent race would otherwise have hidden behind a
      // clean gate), not just a stderr note in scrollback.
      def attempt(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      try attempt()
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed (retrying): ${e.getMessage}")
        retried += name
        try attempt()
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // a separate file (not a key in oracle_sql.json, whose values the
    // driver executes as SQL): empty list = no flakes this run
    Files.writeString(Paths.get(s"$outDir/retried.json"),
      retried.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
