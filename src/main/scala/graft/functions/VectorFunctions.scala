package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Two precision modes:
  *  - [[cosine]] / [[dot]]: full float precision via `zip_with` +
  *    `aggregate` — codegen-friendly Catalyst built-ins, the fast path
  *    for production scoring where bit-reproducibility across engines
  *    is not required.
  *  - [[quantized]]: `round(x*1000)` int64 components. Downstream
  *    integer sums are exact and order-insensitive, which is what the
  *    cross-engine-verified queries (DedupQueries/SimilarityQueries)
  *    build their dot products from.
  */
object VectorFunctions {

  /** Dot product: sum of elementwise products (left fold in index
    * order, whole-stage-codegen'd by Catalyst). Elements promote to
    * double BEFORE multiplying — a bare float*float product would
    * round to float32 first and lose ~1e-7 relative precision vs the
    * fused CosineSimilarity kernel.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Float-path cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantize components to int64 at 1/`scale` resolution (default
    * 1e-3). `round` is half-away-from-zero in both Spark and DuckDB.
    */
  def quantized(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x * lit(scale)).cast("bigint"))

  /** Exact integer dot product of two quantized (int64) vectors — a
    * row-level kernel, so a pairwise score needs NO position-explode
    * join and NO aggregation shuffle. Integer sums are
    * order-insensitive, so this matches an oracle that computes the
    * same dot as SUM over position-joined components. Delegates to the
    * fused codegen kernel [[QDotLong]] (evaluated once per candidate
    * pair in the LSH/ANN hot paths); the composable form below is its
    * differential test oracle.
    */
  def qdot(a: Column, b: Column): Column = QDotLong.qdot_fast(a, b)

  /** Composable-expression formulation of [[qdot]] — materializes the
    * product array per pair; kept as the independent reference
    * implementation the QDotLong spec compares against.
    */
  def qdotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm of a quantized vector. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine from exact integer dot/norms: one double division of
    * bit-identical inputs per engine.
    */
  def qcosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))
}
