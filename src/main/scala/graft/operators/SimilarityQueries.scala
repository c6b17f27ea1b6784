package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * brute-force cosine top-k as the correctness baseline and an
  * IVF-style two-stage search (centroid probe -> inverted-list scan)
  * as the scale path.
  *
  * Determinism: components quantized to int64 (see
  * [[graft.functions.VectorFunctions.quantized]]); every aggregate in
  * the plan is an exact integer sum, the cosine is a single double
  * division of exact inputs, and all top-k orderings carry an id
  * tiebreak — so Spark and DuckDB produce identical rows.
  *
  * Scale design: the dot products are computed as an equi-join on the
  * component position plus a hash aggregate — the sparse-matrix-multiply
  * dataflow shape. Brute force is O(Q x N) and only sane for small
  * query sets (it is the oracle baseline); IVF probes `nprobe=2` of 10
  * centroid lists, cutting the candidate scan ~5x here and ~n_lists/
  * nprobe at scale, where the assignment table would be partitioned by
  * list id. For single-machine hot paths the float expression in
  * VectorFunctions is the faster kernel; the join shape is what
  * distributes.
  */
object SimilarityQueries extends graft.QueryModule {

  private val K = 5       // neighbors returned
  private val NQ = 5      // query vectors: vec_id < NQ
  private val NPROBE = 2  // IVF centroid lists probed

  /** Quantized component rows: (vec_id, label, p, q). */
  private def comps(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(expr("transform(embedding, x -> cast(round(x * 1000) as bigint))"))
          .as(Seq("p", "q")))

  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val q = comps(spark, dir).cache()
    val norms = q.groupBy(col("vec_id")).agg(sum(col("q") * col("q")).as("n2"))
    val queries = q.filter(col("vec_id") < NQ)

    val dots = queries.alias("a")
      .join(q.alias("b"), col("a.p") === col("b.p") && col("a.vec_id") =!= col("b.vec_id"))
      .groupBy(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
      .agg(sum(col("a.q") * col("b.q")).as("dot"))

    val scored = dots
      .join(norms.alias("na"), col("query_id") === col("na.vec_id"))
      .join(norms.alias("nb"), col("neighbor_id") === col("nb.vec_id"))
      .withColumn("cosine",
        col("dot").cast("double") /
          (sqrt(col("na.n2").cast("double")) * sqrt(col("nb.n2").cast("double"))))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "neighbor_id", "rnk", "cosine")
  }

  /** IVF: centroids = exact per-label component sums (the mean's 1/n
    * cancels inside cosine, so centroids stay integer-exact); every
    * vector is assigned to its nearest centroid; a query probes the
    * NPROBE nearest centroid lists and scans only those.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val q = comps(spark, dir).cache()
    val norms = q.groupBy(col("vec_id")).agg(sum(col("q") * col("q")).as("n2"))

    // centroid component sums and squared norms (integer-exact)
    val cent = q.groupBy(col("label"), col("p")).agg(sum(col("q")).as("sumq")).cache()
    val centNorm = cent.groupBy(col("label")).agg(sum(col("sumq") * col("sumq")).as("c2"))

    // affinity(v, centroid): cos = dot(v, sum_c) / (|v| * |sum_c|) — n cancels
    def affinities(vecs: DataFrame): DataFrame =
      vecs.alias("v")
        .join(cent.alias("c"), col("v.p") === col("c.p"))
        .groupBy(col("v.vec_id").as("vid"), col("c.label").as("clabel"))
        .agg(sum(col("v.q") * col("c.sumq")).as("vcdot"))
        .join(norms.alias("vn"), col("vid") === col("vn.vec_id"))
        .join(centNorm.alias("cn"), col("clabel") === col("cn.label"))
        .withColumn("aff",
          col("vcdot").cast("double") /
            (sqrt(col("vn.n2").cast("double")) * sqrt(col("cn.c2").cast("double"))))

    // One affinity pass + one ranking window serves both the index
    // build (rank 1 = assignment) and the query probes (rank <=
    // NPROBE on the query subset) — halves the exchanges vs computing
    // affinities twice.
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("aff").desc, col("clabel"))
    val ranked = affinities(q)
      .withColumn("arnk", row_number().over(wAssign))
      .cache()

    val assigned = ranked
      .filter(col("arnk") === 1)
      .select(col("vid").as("vec_id"), col("clabel").as("list_id"))

    val probes = ranked
      .filter(col("vid") < NQ && col("arnk") <= NPROBE)
      .select(col("vid").as("query_id"), col("clabel").as("list_id"))

    // candidate set: vectors assigned to a probed list (minus self)
    val candidates = probes
      .join(assigned, Seq("list_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))

    val dots = candidates
      .join(q.alias("a"), col("query_id") === col("a.vec_id"))
      .join(q.alias("b"),
        col("neighbor_id") === col("b.vec_id") && col("a.p") === col("b.p"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("a.q") * col("b.q")).as("dot"))

    val scored = dots
      .join(norms.alias("na"), col("query_id") === col("na.vec_id"))
      .join(norms.alias("nb"), col("neighbor_id") === col("nb.vec_id"))
      .withColumn("cosine",
        col("dot").cast("double") /
          (sqrt(col("na.n2").cast("double")) * sqrt(col("nb.n2").cast("double"))))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "neighbor_id", "rnk", "cosine")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> knnBrute,
    "q_knn_ivf" -> knnIvf
  )

  private val compsCte: String =
    """q AS (
      |  SELECT vec_id, label,
      |         generate_subscripts(embedding, 1) AS p,
      |         CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS q
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM q GROUP BY vec_id
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""WITH $compsCte,
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.p = b.p AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < $NQ
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = neighbor_id
        |)
        |SELECT query_id, neighbor_id, rnk, cosine FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= $K""".stripMargin,
    "q_knn_ivf" ->
      s"""WITH $compsCte,
        |cent AS (
        |  SELECT label, p, CAST(sum(q) AS BIGINT) AS sumq FROM q GROUP BY label, p
        |), cent_norm AS (
        |  SELECT label, CAST(sum(sumq * sumq) AS BIGINT) AS c2 FROM cent GROUP BY label
        |), aff AS (
        |  SELECT v.vec_id AS vid, c.label AS clabel,
        |         CAST(sum(v.q * c.sumq) AS DOUBLE) /
        |           (sqrt(CAST(vn.n2 AS DOUBLE)) * sqrt(CAST(cn.c2 AS DOUBLE))) AS aff
        |  FROM q v
        |  JOIN cent c ON v.p = c.p
        |  JOIN norms vn ON vn.vec_id = v.vec_id
        |  JOIN cent_norm cn ON cn.label = c.label
        |  GROUP BY v.vec_id, c.label, vn.n2, cn.c2
        |), assigned AS (
        |  SELECT vid AS vec_id, clabel AS list_id FROM (
        |    SELECT vid, clabel, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY aff DESC, clabel) AS arnk
        |    FROM aff
        |  ) x WHERE arnk = 1
        |), probes AS (
        |  SELECT vid AS query_id, clabel AS list_id FROM (
        |    SELECT vid, clabel, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY aff DESC, clabel) AS prnk
        |    FROM aff WHERE vid < $NQ
        |  ) x WHERE prnk <= $NPROBE
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.vec_id
        |), dots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN q a ON a.vec_id = c.query_id
        |  JOIN q b ON b.vec_id = c.neighbor_id AND a.p = b.p
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = neighbor_id
        |)
        |SELECT query_id, neighbor_id, rnk, cosine FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= $K""".stripMargin
  )
}
