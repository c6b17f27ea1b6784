package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys — the manual fallback
  * when AQE's skew-join splitting can't help (e.g. a broadcast is
  * impossible and one key holds a double-digit percentage of rows).
  *
  * [[saltedJoin]]: the probe side gets a random-ish salt derived from
  * a stable row hash (deterministic, no rand() — keeps retries and
  * cross-engine checks reproducible); the build side fans out to every
  * salt value. The join key becomes (key, salt), spreading a hot key
  * over `buckets` reducers. Correct for inner/left joins where the
  * build side is duplicated per salt; aggregate-after-join must
  * account for the fanout (or use [[twoPhaseAgg]] instead).
  *
  * [[twoPhaseAgg]]: salt -> partial aggregate -> final aggregate; the
  * generic shape for skewed groupBy when the aggregate is decomposable
  * (sum/count/min/max).
  */
object Salting {

  /** Deterministic salt in [0, buckets) from a stable hash of the
    * whole row's join key plus a tiebreak column.
    */
  def salt(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int, tiebreak: String, joinType: String = "inner"): DataFrame = {
    val salted = probe.withColumn("__salt", salt(col(tiebreak), buckets))
    val fanned = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(fanned, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Decomposable aggregate over a skewed key in two phases. `merge`
    * combines the per-salt partials and must satisfy
    * merge(partial(A), partial(B)) = partial(A ++ B): for sum/min/max
    * pass the same function again; for count the merge is `sum`. The
    * parameter is deliberately required — defaulting it to `partial`
    * made count silently return the number of salt buckets.
    */
  def twoPhaseAgg(df: DataFrame, key: String, tiebreak: String, buckets: Int,
      partial: Column => Column, merge: Column => Column,
      valueCol: String, outCol: String): DataFrame = {
    val mergeFn = merge
    df
      .withColumn("__salt", salt(col(tiebreak), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(mergeFn(col("__partial")).as(outCol))
  }
}
