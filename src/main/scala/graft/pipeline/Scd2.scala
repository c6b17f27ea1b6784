package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 historization — the sink semantic
  * the last-writer-wins [[Upsert]] deliberately discards: instead of
  * overwriting, every change VERSIONS the row, so any past state of
  * the dimension can be reconstructed (the audit/compliance shape,
  * and the join target for training-data provenance queries: "which
  * quality score did this doc carry when it entered the mix?").
  *
  * Built from a CHANGE LOG (one row per key per change) in one window
  * pass: `valid_from` = the change's event time, `valid_to` = the
  * next change's event time for the same key (NULL while current),
  * `is_current` = no later change exists. Ties on the event time are
  * broken by a caller-supplied monotone sequence column, so replays
  * produce identical histories.
  *
  * Scale: one shuffle, partitioned by the dimension key — each key's
  * history sorts independently, no global order, no driver state; at
  * 100 TB the change log is the CDC stream's sink table and this is
  * one window over it. A point-in-time readback ([[asOf]]) is a
  * map-only filter on the result (and prunes on valid_from when the
  * history is stored partitioned by validity range).
  */
object Scd2 {

  /** Full dimension history from a change log. Adds valid_from /
    * valid_to / is_current; keeps every input column.
    */
  def fromChangeLog(changes: DataFrame, key: String, ts: String, seq: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time readback: the version of each key valid at `at`
    * (valid_from <= at < valid_to, open-ended for current rows).
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
