package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared tokenized-corpus stage (round 19): one row per document,
  * token arrays identical to the canonical `toks` definition, memoized
  * per (session, dir) with a working reset hook — the invariants every
  * x14–x17/x21–x23 consumer's oracle equivalence rests on. */
class TokDocsStageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("stage preserves the documents grain and the canonical " +
      "tokenization; memo reuses one frame until reset") {
    val d = SparkTestBase.sf
    val docs = Tables.documents(spark, d)
    val stage = TextOps.tokenizedDocs(spark, d)
    assert(stage.columns.toSeq ==
      Seq("doc_id", "source", "lang", "ts"))
    assert(stage.count() == docs.count(),
      "stage must carry every document exactly once")
    // token arrays match split(trim(text), '\s+') doc by doc
    val mism = stage.alias("s")
      .join(docs.select(col("doc_id"),
        expr("split(trim(text), '\\\\s+')").as("want")).alias("w"),
        "doc_id")
      .filter(col("s.ts") =!= col("w.want"))
      .count()
    assert(mism == 0L, s"$mism docs tokenize differently via the stage")
    // memoized: same frame back; reset: a new one
    assert(TextOps.tokenizedDocs(spark, d) eq stage)
    TextOps.resetTokenizedDocs()
    assert(!(TextOps.tokenizedDocs(spark, d) eq stage),
      "reset must drop the memo so a bench run times the stage cold")
  }
}
