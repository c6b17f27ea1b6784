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
      .select(col("id"), TextFunctions.minhash(col("sh"), 0).as("m"))
    val ms = df.orderBy("id").collect().map(_.getString(1))
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
}
