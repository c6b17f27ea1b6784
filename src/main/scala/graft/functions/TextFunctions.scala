package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-expression text kernels. These build shingles/hashes as
  * row-level higher-order-function chains (transform / slice /
  * aggregate), which Catalyst evaluates inside whole-stage codegen —
  * no explode, no per-document window sort, no shuffle. At 100 TB this
  * is the difference between a map-only stage and a full sort+shuffle
  * of every token.
  *
  * The exploded/window formulations (which DuckDB oracles mirror)
  * produce identical values; these kernels are the fast path the
  * operators actually execute.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** All n-word shingles (space-joined), in order, possibly with
    * duplicates; empty array when the doc has fewer than n tokens.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** md5 of every element. */
  def md5All(arr: Column): Column = transform(arr, x => md5(x))

  /** Order-i MinHash value from per-element digests, by
    * Kirsch-Mitzenmacher double hashing: g_i(x) = (h1(x) + i*h2(x))
    * mod 2^32 with h1 = md5 hex chars [1,8] and h2 = chars [17,24] —
    * two DISJOINT windows, so the 9 orders are pairwise-independent
    * linear combinations, not overlapping windows of one digest (the
    * pre-r6 stride-3 windows shared 5 of 8 chars between adjacent
    * orders, silently breaking the b x r banding recall estimate for
    * mid-similarity pairs). All 9 orders still derive from ONE digest
    * per element (compute [[md5All]] once and reuse — 9x fewer md5
    * evaluations than seeded re-hashing). h1 + 8*h2 < 2^36 fits a
    * long exactly; the mod keeps every order in [0, 2^32). DuckDB
    * expresses the same as
    * `min(CAST((('0x'||substr(md5(s),1,8))::UBIGINT +
    *   i*('0x'||substr(md5(s),17,8))::UBIGINT) % 4294967296 AS BIGINT))`.
    */
  def minhashOrder(digests: Column, i: Int): Column = {
    require(i >= 0 && i <= 8, s"minhash order must be 0..8, got $i")
    array_min(transform(digests, d =>
      (conv(substring(d, 1, 8), 16, 10).cast("long") +
        lit(i.toLong) * conv(substring(d, 17, 8), 16, 10).cast("long")) % lit(4294967296L)))
  }

  /** Winnowing minima: for each position, the min of the `window`
    * hashes starting there (window truncates at the end — semantics
    * match ROWS BETWEEN CURRENT AND k FOLLOWING). Delegates to the
    * O(n) monotonic-deque codegen kernel [[SlidingMin]]; the
    * composable O(n*window) form below exists as its differential
    * test oracle.
    */
  def winnowMinima(hashes: Column, window: Int): Column =
    SlidingMin.sliding_min(hashes, window)

  /** Composable-expression formulation of [[winnowMinima]] — O(n*w)
    * re-slicing per position; kept as the independent reference
    * implementation the SlidingMin spec compares against.
    */
  def winnowMinimaComposable(hashes: Column, window: Int): Column =
    // NULL input propagates NULL (standard SQL); empty input returns []
    // — without the guard sequence(0, -1) would produce a DESCENDING
    // [0, -1] and slice(_, 0, _) throws
    when(isnull(hashes), lit(null).cast("array<string>"))
      .when(size(hashes) >= 1,
        transform(
          sequence(lit(0), size(hashes) - lit(1)),
          i => array_min(slice(hashes, i + lit(1), lit(window)))))
      .otherwise(array().cast("array<string>"))

  /** Count-min-sketch cell keys for one token: array of (r, b) structs,
    * 4 md5-salted hash rows x 64 buckets. ONE definition shared by the
    * batch estimator (TextAnalysisQueries.cmsEstimates, whose DuckDB
    * oracle mirrors the same salt/window scheme) and the streaming
    * sketch (StreamingOps.cmsCellsStream) — the same
    * one-definition-per-banding policy as embBandKeys.
    */
  def cmsKeys(tok: Column): Column =
    array((0 until 4).map { i =>
      struct(lit(i).as("r"),
        (conv(substring(md5(concat(lit(s"cm$i:"), tok)), 1, 8), 16, 10)
          .cast("long") % 64).as("b"))
    }: _*)

  /** Integer value of the first 8 md5 hex chars of every token —
    * precomputed once per doc so the 32 SimHash bit-votes reuse it.
    */
  val tokenHashValuesExpr: String =
    "transform(split(text, ' '), t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"

  /** 32-bit SimHash signature over a precomputed `hvs` int array (see
    * [[tokenHashValuesExpr]]). Bit b reads hex char b div 4 (hex chars
    * are high-order-first, hence the 7 - ... shift) and nibble bit
    * b % 4 — the exact mapping the DuckDB oracle spells out with
    * strpos over hex chars. Pure expression tree, codegen-evaluated.
    */
  val simhash32Expr: String =
    """array_join(
      |  transform(sequence(0, 31), b ->
      |    CASE WHEN aggregate(hvs, 0, (acc, hv) ->
      |           acc + CASE WHEN (hv >> (4 * (7 - cast(b div 4 as int)) + b % 4)) & 1 = 1
      |                      THEN 1 ELSE -1 END) > 0
      |         THEN '1' ELSE '0' END),
      |  '')""".stripMargin
}
