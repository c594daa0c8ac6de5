package graft

import graft.decode.TraceDecode
import graft.functions.Codec
import graft.plans.CodecExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `compact_decode` expression: bit-equality with the
  * scala-side kernel over golden + exhaustive-mode compacts, null on
  * malformed, and — the point of its existence — participation in
  * WholeStageCodegen where the old UDF forced a barrier. */
class CodecExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val goldenValues: Seq[BigInt] = Seq(
    BigInt(0), BigInt(1), BigInt(63), BigInt(64), BigInt(16383),
    BigInt(16384), BigInt(0x3fffffffL), BigInt(0x40000000L),
    BigInt("4611686018427387903"), BigInt("4611686018427387904"),
    BigInt(2).pow(100))

  test("expression == scala kernel over all four compact modes") {
    CodecExpressions.register(spark)
    val rows = goldenValues.map(v =>
      Codec.bytesToHex(Codec.compactEncode(v))) ++
      Seq(null, "", "0x", "zz-not-hex", "0x0") // malformed / empty tail
    val out = rows.toDF("v")
      .withColumn("d", expr("compact_decode(v)"))
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    val expected = rows.map(h =>
      Option(TraceDecode.decodeCompactHex(h)).map(_.doubleValue()))
    assert(out.toSeq == expected)
    // and the golden region decodes to the source values
    goldenValues.zip(out).foreach { case (v, d) =>
      assert(d.contains(v.toDouble), s"value $v")
    }
  }

  test("interpreted eval matches codegen") {
    CodecExpressions.register(spark)
    val hexes = goldenValues.map(v =>
      Codec.bytesToHex(Codec.compactEncode(v))).toDF("v")
    val viaCodegen = hexes.withColumn("d", expr("compact_decode(v)"))
      .collect().map(_.getDouble(1)).toSeq
    val viaInterp = goldenValues.map(v =>
      graft.plans.CompactDecodeHelper.decode(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          Codec.bytesToHex(Codec.compactEncode(v)))).doubleValue())
    assert(viaCodegen == viaInterp)
  }

  test("StaticInvoke scalar surface: codegen placement + null guards") {
    graft.functions.Udfs.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_codegen_udf").toString
    val pk = "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a" +
      "5684e7a56da27d"
    Seq(
      (pk, "0x2540be400"),
      ("zz-not-hex", "zz"), // malformed → nulls, stage survives
      (null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("pk", "amt").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir).selectExpr("pk",
      "ss58_encode(pk, 42) AS addr", "to_base_unit(amt, 10) AS v")
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), Option(r.get(2))))
    val byPk = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byPk(pk)._1 != null && byPk(pk)._1.startsWith("5"))
    assert(byPk(pk)._2.contains(1.0)) // 10^10 raw at 10 decimals
    assert(byPk("zz-not-hex") == ((null, None)))
    assert(byPk(null) == ((null, None)))
    // both functions must plan INSIDE WholeStageCodegen (`*(n)`) —
    // the point of replacing the UDFs
    val plan = out.queryExecution.executedPlan.toString
    val line = plan.linesIterator
      .find(l => l.contains("ss58Encode") || l.contains("ss58_encode"))
      .getOrElse("")
    assert(line.contains("*("),
      s"scalar surface fell out of codegen:\n$plan")
  }

  test("decodeTraces projection stays inside WholeStageCodegen") {
    val dim = TraceDecode.prefixDim(spark, Seq(("System", "Account")))
    val sysPrefix = "0x" +
      Codec.bytesToHex(Codec.twox128("System".getBytes) ++
        Codec.twox128("Account".getBytes), prefix = false)
    // a FILE source, not a local relation — local scans never enter
    // whole-stage codegen, which would mask what this test pins
    val dir = java.nio.file.Files
      .createTempDirectory("graft_codegen").toString
    Seq(
      (sysPrefix + "00" * 16,
        Codec.bytesToHex(Codec.compactEncode(BigInt(777))))
    ).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val out = TraceDecode.decodeTraces(spark.read.parquet(dir), dim)
    // collect THIS frame (not a derived one) so out.queryExecution is
    // the executed plan AQE finalized
    val rows = out.collect()
    assert(rows(0).getDouble(rows(0).fieldIndex("decoded_value")) == 777.0)
    // the decode projection must sit under a WholeStageCodegen node
    // (the `*(n)` prefix) — with the old UDF it planned as a bare
    // non-codegen Project. Executed above, so AQE's plan is final.
    val plan = out.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(l => l.contains("compact_decode") && l.contains("Project"))
      .getOrElse("")
    assert(projLine.contains("*("),
      s"decode projection fell out of codegen:\n$plan")
  }
}
