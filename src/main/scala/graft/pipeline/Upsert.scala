package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Insert-or-update-by-PK with last-writer-wins semantics — the
  * capability of the reference's Postgres
  * `INSERT ... ON CONFLICT (pk) DO UPDATE SET <all non-pk> = EXCLUDED.*`
  * (`/root/reference/db.py:51-67`): a re-delivered PK fully overwrites
  * every non-PK column (db.py:55), new PKs insert, absent PKs stay
  * absent ("absence is not knowledge", README.md:44). At-least-once
  * delivery + this sink = effectively-once (SURVEY §2.10 T2).
  *
  * Implementation: no Delta in the jar set (checked /opt/spark/jars),
  * so this is the `unionByName` + `row_number` last-writer-wins rewrite
  * from SURVEY §2.2 K1. One shuffle on the PK; the window partitions by
  * PK so partitions are independent and the operator scales linearly —
  * at real scale the rewrite would land behind a partitioned table
  * (overwrite only the partitions that received updates).
  */
object Upsert {

  /** @param existing current sink contents
    * @param updates  incoming batch (same schema, by name)
    * @param pk       primary-key column names
    * @return the merged table: every PK once; for PKs present in
    *         `updates` the update row wins wholesale
    *
    * If `updates` carries the same PK twice (an at-least-once source
    * delivering duplicates within one batch), the winner is chosen
    * deterministically by ordering the duplicate rows on their non-PK
    * columns — re-running the merge always yields the same row.
    * (Postgres `ON CONFLICT` would instead error on intra-statement
    * duplicates, db.py:62; deterministic-pick is the streaming-friendly
    * relaxation.)
    */
  def apply(existing: DataFrame, updates: DataFrame, pk: Seq[String]): DataFrame =
    merge(existing, updates, pk,
      col("__src_priority").desc +: dupTiebreak(updates, pk))

  /** The shared merge skeleton: tag source priority, keep the first
    * row per PK under `orderCols`.
    */
  private def merge(existing: DataFrame, updates: DataFrame, pk: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val tagged = existing.withColumn("__src_priority", lit(0))
      .unionByName(updates.withColumn("__src_priority", lit(1)))
    val w = Window.partitionBy(pk.map(col): _*).orderBy(orderCols: _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src_priority", "__rn")
  }

  /** Deterministic ordering for duplicate-PK rows: the ORDERABLE
    * non-PK columns ascending (maps and other unorderable types can't
    * go in a window ORDER BY — analysis fails), then a canonical JSON
    * rendering of any unorderable columns as the final key, so rows
    * that differ ONLY in a map column still pick a stable winner
    * instead of a shuffle-dependent one.
    */
  private def dupTiebreak(df: DataFrame, pk: Seq[String]): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => orderable(et)
      case StructType(fields) => fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val (ord, unord) = df.schema.fields
      .filter(f => !pk.contains(f.name))
      .partition(f => orderable(f.dataType))
    val ordCols = ord.map(f => col(f.name).asc_nulls_last).toSeq
    if (unord.isEmpty) ordCols
    else ordCols :+ to_json(struct(unord.map(f => col(f.name)).toSeq: _*)).asc_nulls_last
  }

  /** Version-column variant: duplicate-PK rows are resolved by the
    * designated version column FIRST (highest wins, e.g. an
    * `updated_at` ingest timestamp) — so a stale redelivery can never
    * overwrite newer sink state, which is what makes OUT-OF-ORDER
    * at-least-once delivery effectively-once (the priority-based
    * [[apply]] assumes in-order batches). Version ties fall to source
    * priority (the update row) then the usual tiebreak; at wide
    * schemas the version decides long before the expensive full
    * comparator runs.
    */
  def apply(existing: DataFrame, updates: DataFrame, pk: Seq[String],
      versionCol: String): DataFrame =
    merge(existing, updates, pk,
      col(versionCol).desc_nulls_last +: col("__src_priority").desc +:
        dupTiebreak(updates, pk :+ versionCol))

  /** Collapse duplicate-PK rows within one batch to a single
    * deterministic winner — the same tiebreak rule [[apply]] uses, so
    * a batch pre-deduplicated here merges identically through any
    * sink, including the set-based [[JdbcSink]] MERGE (which, like
    * Postgres ON CONFLICT, requires at most one source row per PK).
    */
  /** Version-aware in-batch dedup: keeps the highest-version row per
    * PK — the winner the version-column [[apply]] would pick, so
    * pre-deduplicating for a MERGE sink and merging directly stay
    * consistent.
    */
  def dedupeByPk(updates: DataFrame, pk: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last +: dupTiebreak(updates, pk :+ versionCol): _*)
    updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def dedupeByPk(updates: DataFrame, pk: Seq[String]): DataFrame = {
    // all-PK schemas have no tiebreak columns; duplicates are then full
    // rows and any non-empty ORDER BY (row_number requires one) works
    val ord = dupTiebreak(updates, pk) match {
      case Seq() => pk.map(col(_).asc)
      case o => o
    }
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord: _*)
    updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Multi-batch variant: later batches win over earlier ones, all win
    * over `existing` — the per-page eager-commit loop of the reference
    * (`wdn_api.py:121-122`, SURVEY T3) collapsed into one plan.
    */
  def applyAll(existing: DataFrame, batches: Seq[DataFrame], pk: Seq[String]): DataFrame = {
    val tagged = batches.zipWithIndex
      .map { case (b, i) => b.withColumn("__src_priority", lit(i + 1)) }
      .foldLeft(existing.withColumn("__src_priority", lit(0)))(_ unionByName _)
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col("__src_priority").desc +: dupTiebreak(existing, pk): _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src_priority", "__rn")
  }
}
