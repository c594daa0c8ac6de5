package graft

import graft.operators.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** Golden semantics for the duplicated-substring span merge (d9):
  * a position is covered iff its n-gram repeats anywhere in the corpus,
  * covered intervals [pos, pos+n−1] merge when they overlap or touch
  * (gap ≤ n), and islands split past that. Hand-computed fixture with
  * n = 3 so every expected span is checkable by eye. */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // Corpus-wide duplicated 3-grams: "a b c" (d1@0, d1@9, d2@3),
  // "b c X" (d1@1, d2@4), "c X Y" (d1@2, d2@5), "X Y Z" (d1@3, d2@0,
  // d2@6), "q r s" (d1@6, d3@1). Everything else is unique.
  private val docs = Seq(
    (1L, "a b c X Y Z q r s a b c"),
    (2L, "X Y Z a b c X Y Z"),
    (3L, "p q r s t u v"))

  test("span merge: overlap/touch merges into maximal spans") {
    val s = spark
    import s.implicits._
    val got = DedupOps.dupSpans(docs.toDF("doc_id", "text"), n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList

    // doc 1 coverage {0,1,2,3,6,9}: every gap ≤ 3 touches → ONE
    //   maximal span [0, 11] over 6 duplicated grams
    // doc 2 coverage {0,3,4,5,6} → one span [0, 8], 5 grams
    // doc 3 coverage {1} → span [1, 3], 1 gram
    assert(got == List(
      (1L, 0L, 11L, 6L),
      (2L, 0L, 8L, 5L),
      (3L, 1L, 3L, 1L)))
  }

  test("a gap wider than n splits islands") {
    val s = spark
    import s.implicits._
    // "k l m" repeats at pos 0 and 8 in doc 10 — gap 8 > 3, so two
    // spans; the middle filler grams are unique
    val got = DedupOps.dupSpans(Seq(
      (10L, "k l m f1 f2 f3 f4 f5 k l m"),
      (11L, "k l m z1 z2")).toDF("doc_id", "text"), n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got == List(
      (10L, 0L, 2L, 1L),
      (10L, 8L, 10L, 1L),
      (11L, 0L, 2L, 1L)))
  }

  test("a corpus with no repeated n-gram yields no spans") {
    val s = spark
    import s.implicits._
    val got = DedupOps.dupSpans(
      Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text"),
      n = 3)
    assert(got.count() == 0)
  }
}
