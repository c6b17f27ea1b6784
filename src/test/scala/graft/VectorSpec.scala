package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("float-path cosine matches hand-computed values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f), 24.0 / 25.0)
    ).toDF("a", "b", "want")
    val bad = df.select((abs(cosine(col("a"), col("b")) - col("want")) > 1e-9).as("bad"))
      .filter(col("bad")).count()
    assert(bad == 0)
  }

  test("quantized components round half away from zero to int64") {
    val df = Seq((Array(0.0015f, -0.0015f, 0.51f))).toDF("v")
    val q = df.select(quantized(col("v")).as("q")).head().getSeq[Long](0)
    assert(q == Seq(2L, -2L, 510L))
  }

  test("brute-force KNN self-consistency: neighbors ranked by descending cosine") {
    val knn = graft.operators.SimilarityQueries.knnBrute(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rnk")
    val violations = knn
      .withColumn("prev", lag(col("cosine"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("cosine"))
    assert(violations.count() == 0)
  }
}
