package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused Catalyst kernels must be bit-identical to the
  * compose-built-ins fold form (same accumulation order, same IEEE ops)
  * — that identity is what keeps the DuckDB oracle valid. */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("cosine_sim / dot_product == sequential fold, bit for bit") {
    val emb = Tables.embeddings(spark, SparkTestBase.sf).limit(200)
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("va") < col("vb")).limit(5000)
    val diff = pairs.select(
        expr("cosine_sim(ea, eb)").as("fused"),
        VectorOps.cosineFold("ea", "eb").as("fold"),
        expr("dot_product(ea, eb)").as("dfused"),
        VectorOps.dotFold("ea", "eb").as("dfold"))
      .filter(col("fused") =!= col("fold") ||
        col("dfused") =!= col("dfold"))
    assert(diff.count() == 0)
  }

  test("cosine_sim of a vector with itself is ~1 (normalized inputs)") {
    val emb = Tables.embeddings(spark, SparkTestBase.sf).limit(50)
    val bad = emb.select(expr("cosine_sim(embedding, embedding)").as("c"))
      .filter(abs(col("c") - 1.0) > 1e-6)
    assert(bad.count() == 0)
  }

  test("interpreted eval matches codegen") {
    // force interpreted path by evaluating through a filter on a
    // literal-free projection collected twice with codegen on/off
    val emb = Tables.embeddings(spark, SparkTestBase.sf).limit(20)
    val withCodegen = emb.select(expr("cosine_sim(embedding, reverse(embedding))"))
      .collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = emb.select(expr("cosine_sim(embedding, reverse(embedding))"))
        .collect().map(_.getDouble(0)).toSeq
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
