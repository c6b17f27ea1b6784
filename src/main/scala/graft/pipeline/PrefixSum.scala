package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) — the scan primitive behind
  * sequence packing (global token offsets) and quota accounting
  * (per-source running totals).
  *
  * A plain `sum(x) over (partition by p order by id)` funnels every
  * partition's entire history through ONE WindowExec task, which is a
  * scale-killer whenever partitions are large (few sources, or no
  * partitioning at all for a global offset). This helper computes the
  * same exclusive running total as an L-level reduction tree, the
  * Beam/FlumeJava-style distributed scan:
  *
  *  - level 1: rows bucket by `id div k`; running sums WITHIN a bucket
  *    run in parallel, one task never sees more than k rows;
  *  - level i: bucket totals roll up by another factor of k, with the
  *    running sum across sibling buckets again bounded by k rows;
  *  - only the TOP level's bucket totals — n / k^levels rows — pass
  *    through a single-task window.
  *
  * Bound: top-task rows = n / k^levels. With k = 1000 the default
  * levels = 2 puts a 100 TB corpus (~10^10 docs) at ~10^4 rows through
  * the top-level task and a 10^12-doc corpus at ~10^6; every further
  * factor-1000 is one `levels` increment away (levels = 3 holds a
  * 10^12-doc corpus to ~10^3). Each level costs one small groupBy
  * over bucket totals plus one bounded window — roughly 0.2 s of
  * fixed stage overhead per level at fixture scale, which is why the
  * default is the smallest depth that covers the design target rather
  * than the deepest tree.
  *
  * All arithmetic is integer-exact, so the result is bit-identical to
  * the one-window form at any level count (PrefixSumSpec pins this
  * differentially; the SQL oracles of q_pack / q_quota stay the plain
  * window formulation and their hash match certifies it end-to-end).
  */
object PrefixSum {

  /** Adds `out`: the EXCLUSIVE running total of `valCol` over rows
    * ordered by `idCol` within `partCols` (empty = one global scan).
    * The inclusive form is `out + valCol`. `idCol` must be integral
    * and unique within a partition (bucketing divides it by k).
    */
  def exclusiveOffsets(df: DataFrame, partCols: Seq[String], idCol: String,
      valCol: String, out: String, levels: Int = 2, k: Long = 1000L): DataFrame =
    exclusiveOffsetsMulti(df, partCols, idCol, Seq(valCol -> out), levels, k)

  /** Multi-column form: each `(valCol, out)` pair gets its own
    * exclusive running total, all carried through ONE reduction tree
    * (one set of bucket-total shuffles and descent joins instead of
    * one tree per column — a two-column scan like q_vocab_growth's
    * cumulative vocab + cumulative tokens halves its fixed per-level
    * stage cost). Identical arithmetic per column to the single-column
    * form (PrefixSumSpec pins the equivalence differentially).
    */
  def exclusiveOffsetsMulti(df: DataFrame, partCols: Seq[String], idCol: String,
      vals: Seq[(String, String)], levels: Int = 2, k: Long = 1000L): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    require(k >= 2, s"k must be >= 2, got $k")
    require(vals.nonEmpty, "need at least one (valCol, out) pair")
    val part = partCols.map(col)
    val n = vals.size
    def b(i: Int) = s"__psum_b$i"
    def tot(j: Int) = s"__psum_tot$j"

    // Per-level bucket totals: t(i) has (partCols, b_i, tot0..totN).
    // The coarser bucket is always derivable (b_{i+1} = b_i div k,
    // since integer division composes), so each frame carries only its
    // own bucket column.
    val totals = new Array[DataFrame](levels + 1)
    totals(1) = df
      .withColumn(b(1), expr(s"$idCol div $k"))
      .groupBy(part :+ col(b(1)): _*)
      .agg(sum(col(vals.head._1)).as(tot(0)),
        (1 until n).map(j => sum(col(vals(j)._1)).as(tot(j))): _*)
    for (i <- 2 to levels)
      totals(i) = totals(i - 1)
        .withColumn(b(i), expr(s"${b(i - 1)} div $k"))
        .groupBy(part :+ col(b(i)): _*)
        .agg(sum(col(tot(0))).as(tot(0)),
          (1 until n).map(j => sum(col(tot(j))).as(tot(j))): _*)

    def exclusive(w: org.apache.spark.sql.expressions.WindowSpec, c: String) =
      coalesce(sum(col(c)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))

    val outs = vals.map(_._2)

    // Top level: the ONLY single-task-per-partition window, over
    // n / k^levels bucket totals (all columns share one window).
    val wTop = Window.partitionBy(part: _*).orderBy(col(b(levels)))
    var off = totals(levels)
      .select(part ++ Seq(col(b(levels))) ++
        (0 until n).map(j => exclusive(wTop, tot(j)).as(outs(j))): _*)

    // Descend: each level's offset = parent bucket's offset + the
    // running total of preceding sibling buckets (<= k rows per task).
    for (i <- (levels - 1) to 1 by -1) {
      val parent = b(i + 1)
      val lvl = totals(i).withColumn(parent, expr(s"${b(i)} div $k"))
      val wLvl = Window.partitionBy(part :+ col(parent): _*).orderBy(col(b(i)))
      off = lvl
        .select((lvl.columns.map(col) ++
          (0 until n).map(j => exclusive(wLvl, tot(j)).as(s"__psum_local$j"))).toSeq: _*)
        .join(off, partCols :+ parent)
        .select(part ++ Seq(col(b(i))) ++
          (0 until n).map(j => (col(outs(j)) + col(s"__psum_local$j")).as(outs(j))): _*)
    }

    // Row level: parent bucket offset + preceding rows within the
    // bucket (<= k rows per task).
    val withB = df.withColumn(b(1), expr(s"$idCol div $k"))
    val wRow = Window.partitionBy(part :+ col(b(1)): _*).orderBy(col(idCol))
    var res = withB.join(off, partCols :+ b(1))
    for (j <- 0 until n)
      res = res.withColumn(outs(j), col(outs(j)) + exclusive(wRow, vals(j)._1))
    res.drop(b(1))
  }

  /** Adds `out`: the EXCLUSIVE running MAX of `valCol` over rows
    * ordered by `idCol` within `partCols` — null for each partition's
    * first row (no preceding rows), exactly like the one-window
    * `max(valCol) over (order by idCol rows between unbounded preceding
    * and 1 preceding)` form, but through the same L-level reduction
    * tree as [[exclusiveOffsetsMulti]] so no task ever scans more than
    * k rows (max is a monoid just like sum; `greatest` skips nulls, so
    * the empty-prefix identity propagates correctly down the tree).
    * Powers event-time watermark accounting (q_late_events): the
    * watermark BEFORE an event is the max event-time already ingested.
    */
  def exclusiveRunningMax(df: DataFrame, partCols: Seq[String], idCol: String,
      valCol: String, out: String, levels: Int = 2, k: Long = 1000L): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    require(k >= 2, s"k must be >= 2, got $k")
    val part = partCols.map(col)
    def b(i: Int) = s"__pmax_b$i"

    val totals = new Array[DataFrame](levels + 1)
    totals(1) = df
      .withColumn(b(1), expr(s"$idCol div $k"))
      .groupBy(part :+ col(b(1)): _*)
      .agg(max(col(valCol)).as("__pmax_tot"))
    for (i <- 2 to levels)
      totals(i) = totals(i - 1)
        .withColumn(b(i), expr(s"${b(i - 1)} div $k"))
        .groupBy(part :+ col(b(i)): _*)
        .agg(max(col("__pmax_tot")).as("__pmax_tot"))

    def exclusiveMax(w: org.apache.spark.sql.expressions.WindowSpec) =
      max(col("__pmax_tot")).over(w.rowsBetween(Window.unboundedPreceding, -1))

    val wTop = Window.partitionBy(part: _*).orderBy(col(b(levels)))
    var off = totals(levels)
      .select(part ++ Seq(col(b(levels)), exclusiveMax(wTop).as(out)): _*)

    for (i <- (levels - 1) to 1 by -1) {
      val parent = b(i + 1)
      val lvl = totals(i).withColumn(parent, expr(s"${b(i)} div $k"))
      val wLvl = Window.partitionBy(part :+ col(parent): _*).orderBy(col(b(i)))
      off = lvl
        .withColumn("__pmax_local", exclusiveMax(wLvl))
        .join(off, partCols :+ parent)
        .select(part ++ Seq(col(b(i)),
          greatest(col(out), col("__pmax_local")).as(out)): _*)
    }

    val withB = df.withColumn(b(1), expr(s"$idCol div $k"))
    val wRow = Window.partitionBy(part :+ col(b(1)): _*).orderBy(col(idCol))
    withB.join(off, partCols :+ b(1))
      .withColumn(out, greatest(col(out),
        max(col(valCol)).over(wRow.rowsBetween(Window.unboundedPreceding, -1))))
      .drop(b(1))
  }
}
