package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval-point) join — the join family with NO equi key:
  * each point row matches every interval containing it. Spark's
  * planner can only express the raw form as a broadcast-nested-loop /
  * cartesian filter, which is quadratic and (for two large sides)
  * undistributable. This operator rewrites it as an EQUI-join on a
  * computed bucket key, the standard distributed range-join technique
  * (used natively by e.g. Spark's SQL engine only when one side is
  * broadcastable):
  *
  *  - fix a bucket width W (seconds);
  *  - a point belongs to bucket floor(epoch / W) — one row each;
  *  - an interval [s, e] explodes to every bucket it overlaps
  *    (`sequence(floor(s/W), floor(e/W))` — ceil(len/W)+1 rows);
  *  - equi-join on the bucket id, then the EXACT containment
  *    predicate filters the candidates.
  *
  * Scale: shuffle is keyed by bucket — both sides partition freely;
  * per-task work is (points-per-bucket x intervals-overlapping-
  * bucket), bounded by choosing W near the typical interval length
  * (the same dial as PrefixSum's k / SemDedup's SEM_CAP: a constant
  * the operator exposes, not hides). A point has exactly ONE bucket,
  * so each (interval, point) pair meets on exactly one bucket row —
  * no post-join deduplication needed. CatalogSpec's global no-BNLJ
  * audit applies to [[PipelineQueries]]'s q_range_join like every
  * other query — the bucketized plan is hash-joinable, which is the
  * point. RangeJoinSpec differential-tests it against the naive
  * cross-filter form on the fixture.
  */
object RangeJoin {

  /** Join `points` (timestamp column `ptCol`) to `intervals`
    * ([startCol, endCol] inclusive-exclusive) on containment:
    * start <= pt < end. Returns every (interval row, point row) match
    * with both sides' columns; callers aggregate as needed.
    * `bucketSeconds` is the scale dial (see class doc).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val w = lit(bucketSeconds)
    val pts = points.withColumn("__pb", floor(unix_timestamp(col(ptCol)) / w))
    val ivs = intervals.withColumn("__ib",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / w),
        floor(unix_timestamp(col(endCol)) / w))))
    ivs.join(pts, col("__ib") === col("__pb") &&
        col(startCol) <= col(ptCol) && col(ptCol) < col(endCol))
      .drop("__pb", "__ib")
  }
}
