package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's incremental-recomputation-avoidance step
  * (`/root/reference/etl.py:14-20`): given candidate rows and the keys
  * already processed recently, keep only the candidates that are NOT in
  * the recent set — a case-insensitive left-anti join plus distinct (the
  * reference materializes both sides into Python sets, which also
  * dedups: `etl.py:20`).
  *
  * Scale design: expressed as `LEFT ANTI` on a normalized key so
  * Catalyst picks broadcast-anti when the recent side is small (the
  * common case: "rows touched in the last day" ≪ candidate universe)
  * and falls back to shuffled hash/sort-merge anti otherwise; AQE
  * re-plans at runtime. No driver-side collection at any size.
  */
object IncrementalFilter {

  /** Normalize a match key the way `etl.py:17-19` does: strings compare
    * case-insensitively, everything else as-is.
    */
  private def norm(c: Column, caseInsensitive: Boolean): Column =
    if (caseInsensitive) lower(c) else c

  /** @param candidates   rows that could need processing
    * @param recent       rows already processed inside the recency window
    * @param candidateKey match column in `candidates` (etl.py `match_field`)
    * @param recentKey    match column in `recent`
    * @param caseInsensitive lowercase both sides first (etl.py:17-19)
    * @return distinct candidates whose key is absent from `recent`
    */
  def apply(
      candidates: DataFrame,
      recent: DataFrame,
      candidateKey: String,
      recentKey: String,
      caseInsensitive: Boolean = true): DataFrame = {
    val recentKeys = recent
      .select(norm(col(recentKey), caseInsensitive).as("__ifilter_key"))
    candidates
      .join(
        recentKeys,
        norm(candidates(candidateKey), caseInsensitive) === recentKeys("__ifilter_key"),
        "left_anti")
      .distinct()
  }

  /** Recency watermark shape of `etl.py:15,26-27`: rows of `sink` whose
    * `tsCol` is strictly newer than `cutoff`.
    */
  def recent(sink: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    sink.filter(col(tsCol) > cutoff)
}
