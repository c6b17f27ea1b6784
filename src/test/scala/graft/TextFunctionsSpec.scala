package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles produces n-k+1 shingles in order; short docs give empty") {
    val df = Seq("a b c d e", "a b", "solo").toDF("text")
      .select(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toList).toList
    assert(rows.head == List("a b c", "b c d", "c d e")) // 5 - 3 + 1
    assert(rows(1).isEmpty && rows(2).isEmpty)
  }

  test("minhash is invariant to shingle order (set semantics)") {
    val df = Seq(
      (1, Array("x y z", "a b c")),
      (2, Array("a b c", "x y z"))).toDF("id", "sh")
      .select(col("id"),
        TextFunctions.minhashOrder(TextFunctions.md5All(col("sh")), 0).as("m"))
    val ms = df.orderBy("id").collect().map(_.getLong(1))
    assert(ms(0) == ms(1))
  }

  test("winnowMinima shares fingerprints for shared runs of hashes") {
    // identical hash windows -> identical minima regardless of position
    val a = Seq(Tuple1(Array("h3", "h1", "h2", "h5"))).toDF("hs")
    val b = Seq(Tuple1(Array("h9", "h3", "h1", "h2", "h5"))).toDF("hs")
    val fa = a.select(array_distinct(TextFunctions.winnowMinima(col("hs"), 2)))
      .head().getSeq[String](0).toSet
    val fb = b.select(array_distinct(TextFunctions.winnowMinima(col("hs"), 2)))
      .head().getSeq[String](0).toSet
    // winnowing guarantee: long shared runs yield shared minima
    assert(fa.intersect(fb).nonEmpty)
  }

  test("SlidingMin matches the composable O(n*w) formulation on random arrays") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 60).map { i =>
      val n = rnd.nextInt(12) // includes 0-length
      (i, (0 until n).map(_ => f"h${rnd.nextInt(8)}%02d").toArray)
    } :+ (999, Array.empty[String])
    for (w <- Seq(1, 2, 5, 9)) {
      val df = cases.toDF("id", "hs").select(
        col("id"),
        TextFunctions.winnowMinima(col("hs"), w).as("fast"),
        TextFunctions.winnowMinimaComposable(col("hs"), w).as("ref"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"window=$w id=${r.getInt(0)}")
      }
    }
  }

  test("SlidingMin null semantics: null array -> null, null elements skipped") {
    val df = Seq(
      (1, Array[String]("b", null, "a")),
      (2, Array[String](null, null)),
      (3, null)).toDF("id", "hs")
      .select(col("id"), TextFunctions.winnowMinima(col("hs"), 2).as("m"))
    val rows = df.orderBy("id").collect()
    // window {b, null} -> b; {null, a} -> a; {a} -> a
    assert(rows(0).getSeq[String](1) == Seq("b", "a", "a"))
    // all-null windows -> null entries (array_min semantics)
    assert(rows(1).getSeq[String](1) == Seq(null, null))
    assert(rows(2).isNullAt(1))
    // interpreted path agrees with codegen
    import graft.functions.SlidingMin
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val e = SlidingMin(Literal.create(null, org.apache.spark.sql.types.StringType), Literal(2))
    val in = new GenericArrayData(Array[Any](
      UTF8String.fromString("b"), null, UTF8String.fromString("a")))
    val out = e.nullSafeEval(in, 2).asInstanceOf[ArrayData]
    assert((0 until 3).map(out.getUTF8String(_).toString) == Seq("b", "a", "a"))
  }

  test("simhash expression matches a reference implementation on one doc") {
    val df = Seq("hello world hello").toDF("text")
      .withColumn("hvs", expr(TextFunctions.tokenHashValuesExpr))
      .select(expr(TextFunctions.simhash32Expr).as("sig"))
    val sig = df.head().getString(0)
    // independent scala computation of the same definition
    def hv(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(md, 16)
    }
    val toks = Seq("hello", "world", "hello")
    val expected = (0 until 32).map { b =>
      val votes = toks.map { t =>
        if (((hv(t) >> (4 * (7 - b / 4) + b % 4)) & 1L) == 1L) 1 else -1
      }.sum
      if (votes > 0) "1" else "0"
    }.mkString
    assert(sig == expected)
  }

  test("BPE-ish token count segments letter/digit/punct runs with leading spaces") {
    import spark.implicits._
    import graft.operators.TextAnalysisQueries
    val dir = java.nio.file.Files.createTempDirectory("bpe_toks").toString
    Seq(
      // don|'|t| stop| 42|x -> 6; the apostrophe splits the letter run
      (1L, "don't stop 42x"),
      // hello|,| world|!|!| 2024 -> punct runs collapse: hello|,| world|!!| 2024 -> 5
      (2L, "hello, world!! 2024"),
      (3L, "abc"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("xx"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysisQueries.tokenCount(spark, dir)
      .select("doc_id", "bpe_tokens").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 6L, 2L -> 5L, 3L -> 1L))
  }
}
