package graft.pipeline

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC upsert sink — engine-side equivalent of the reference's
  * Postgres `INSERT ... ON CONFLICT (pk) DO UPDATE` target
  * (`/root/reference/db.py:51-67`, `db_config.yml:2`). Spark's
  * `df.write.jdbc` can only append or overwrite, so the sink uses the
  * standard two-phase staging shape:
  *
  *  1. executors bulk-write the (PK-deduplicated) batch into a staging
  *     table — one JDBC connection per partition, the distributed half
  *     of the job;
  *  2. the driver issues ONE set-based MERGE from staging into the
  *     target, which the database applies atomically — no per-row
  *     driver loop, and the data never funnels through the driver.
  *
  * The target table is created on first load via an empty append
  * (CREATE-if-absent, K2 parity); intra-batch duplicate PKs collapse
  * to [[Upsert.dedupeByPk]]'s deterministic winner first, because a
  * MERGE — like Postgres ON CONFLICT (db.py:62) — rejects multiple
  * source rows per key.
  *
  * Identifier casing: Spark's JDBC writer emits COLUMN names quoted
  * (exact case) but TABLE names unquoted (folded by the database), so
  * the MERGE below quotes columns and leaves table names bare — both
  * sides of each identifier then fold identically. Works against any
  * MERGE-capable dialect; exercised against embedded Derby in
  * PipelineSpec (the jar set ships no Postgres driver).
  */
object JdbcSink {

  /** Insert-or-update `updates` into JDBC `table` keyed by `pk`.
    *
    * @param options extra writer/connection options (e.g. "driver",
    *                "createTableColumnTypes" to map string PKs to
    *                VARCHAR on dialects whose default text type is not
    *                comparable, like Derby's CLOB)
    */
  def upsert(
      updates: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      options: Map[String, String] = Map.empty): Unit = {
    val cols = updates.schema.fieldNames.toSeq
    require(pk.nonEmpty, "upsert needs at least one pk column")
    require(pk.forall(cols.contains), s"pk ${pk.mkString(",")} not all present in ${cols.mkString(",")}")

    val staging = table + "_staging"
    def write(df: DataFrame, target: String, mode: SaveMode): Unit = {
      val w = df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", target)
        .mode(mode)
      options.foreach { case (k, v) => w.option(k, v) }
      w.save()
    }

    // phase 0: ensure the target exists (empty append = DDL if-not-exists)
    write(updates.limit(0), table, SaveMode.Append)
    // phase 1: distributed bulk load of the deduplicated batch
    write(Upsert.dedupeByPk(updates, pk), staging, SaveMode.Overwrite)

    // phase 2: one atomic set-based merge on the database
    val q = (c: String) => "\"" + c + "\""
    val nonPk = cols.filterNot(pk.contains)
    val merge =
      s"""MERGE INTO $table t USING $staging s
         |ON ${pk.map(c => s"t.${q(c)} = s.${q(c)}").mkString(" AND ")}
         |${if (nonPk.nonEmpty)
             s"WHEN MATCHED THEN UPDATE SET ${nonPk.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")}"
           else ""}
         |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
         |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
    // the driver-side connection must authenticate the same way the
    // executor writers did: forward the caller's connection options
    // (user/password/...) and pre-load an explicitly named driver class
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.createStatement().executeUpdate(merge)
      conn.createStatement().executeUpdate(s"DROP TABLE $staging")
    } finally conn.close()
  }
}
