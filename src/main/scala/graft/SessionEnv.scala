package graft

import org.apache.spark.sql.SparkSession

/** Shared SPARK_GRAFT_MASTER handling for the driver-contract mains
  * (Verify, Bench): default `local[cpus]`; set it to
  * `local-cluster[n,cores,memMB]` to run the same contract under a
  * REAL multi-JVM master — separate executor processes, real
  * exchange/broadcast serialization, worker-side classloading — the
  * failure modes a single-JVM local master cannot express. The graft
  * classes ride to the executors via extraClassPath (Spark's own jars
  * come from SPARK_HOME on the worker side). ONE definition so the
  * correctness and the performance legs can never disagree on how the
  * cluster master is wired.
  */
object SessionEnv {
  /** The configured master string (for logging/labels). */
  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** A builder with master + (for local-cluster) executor classpath. */
  def builder(cpus: String): SparkSession.Builder = {
    val m = master(cpus)
    val b0 = SparkSession.builder().master(m)
    if (m.startsWith("local-cluster"))
      // decode via toURI: getPath is percent-encoded, so a checkout
      // path with spaces would yield a classpath executors can't read
      b0.config("spark.executor.extraClassPath",
        java.nio.file.Paths.get(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI).toString)
    else b0
  }
}
