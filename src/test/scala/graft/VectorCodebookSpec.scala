package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF codebook has two physical kernels: a plan-literal codegen'd
  * expression for small codebooks and a broadcast-variable UDF for
  * production-sized ones (a 64k×128 codebook inlined as a literal would
  * be re-serialized into every task binary). Correctness requires the
  * two to be ARITHMETIC-IDENTICAL — same float64 accumulation order,
  * same HALF_UP rounding, same (sim DESC, cell ASC) ordering with the
  * same NaN placement — or the oracle-green v2/v5/v6/v7 results would
  * silently change the day a codebook crosses the size threshold. */
class VectorCodebookSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val emb =
    Tables.embeddings(spark, SparkTestBase.sf).limit(300).cache()

  private def assigned(maxLiteralBytes: Long, probes: Int) = {
    val cb = VectorOps.collectCodebook(emb, 8)
    VectorOps.assignCells(
        emb.select(col("vec_id"), col("embedding")),
        "embedding", cb, probes, maxLiteralBytes)
      .select(col("vec_id"), col("cell"), col("csim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
      .toSeq
  }

  test("broadcast kernel is bit-identical to the literal kernel, probes=1") {
    val lit = assigned(maxLiteralBytes = Long.MaxValue, probes = 1)
    val bc = assigned(maxLiteralBytes = 0L, probes = 1)
    assert(lit.nonEmpty)
    assert(bc == lit)
  }

  test("broadcast kernel is bit-identical to the literal kernel, probes=2") {
    val lit = assigned(maxLiteralBytes = Long.MaxValue, probes = 2)
    val bc = assigned(maxLiteralBytes = 0L, probes = 2)
    assert(lit.size == 2 * (lit.size / 2)) // every vector probes 2 cells
    assert(bc == lit)
  }

  test("codebook size accounting drives kernel selection") {
    val cb = VectorOps.collectCodebook(emb, 8)
    // 8 cells x 64-dim floats + 8-byte ids
    assert(VectorOps.codebookBytes(cb) == 8L * (8L + 4L * 64L))
    assert(VectorOps.codebookBytes(cb) < VectorOps.CodebookLiteralMaxBytes,
      "fixture codebook should ride the literal kernel by default")
  }
}
