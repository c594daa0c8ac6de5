package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SymSpell typo canonicalization (x22): the deletion-neighborhood
  * blocking must be COMPLETE for edit distance ≤ 1 — that is the whole
  * theorem the linear-fan-out design rests on — and must emit nothing
  * beyond distance 1 after the verify.
  */
class SymSpellSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded levenshtein_le agrees with the full DP, clamped at k+1") {
    import org.apache.spark.unsafe.types.UTF8String
    def le(a: String, b: String, k: Int): Int =
      graft.plans.CodecKernels.levenshteinLe(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
    val words = (0 until 120).map(i =>
      ("abcdefgh" * 3).drop(i % 5).take(3 + i % 9) + s"${i % 7}")
    for {
      i <- words.indices; j <- words.indices; k <- Seq(1, 2, 3)
    } {
      val full = lev(words(i), words(j))
      val got = le(words(i), words(j), k)
      assert(got === math.min(full, k + 1),
        s"(${words(i)}, ${words(j)}, k=$k): full=$full got=$got")
    }
    // edges: empty strings, equal strings, length-gap early exit
    assert(le("", "", 1) === 0)
    assert(le("", "ab", 1) === 2)
    assert(le("abc", "abc", 0) === 0)
    assert(le("abcdef", "abc", 2) === 3)
    // code POINTS, not UTF-16 units: an astral-plane char is one edit
    // (what Spark's built-in and DuckDB measure), not two surrogates
    val astral = new String(Character.toChars(0x1F600))
    assert(le(s"ab${astral}cd", "abcd", 1) === 1)
    assert(le(s"ab${astral}cd", s"ab${astral}cd", 0) === 0)
  }

  test("blocking is complete for distance <= 1 and verify is tight") {
    // replicate the query's vocabulary derivation in-process
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val clean = docs.flatMap(_._2.trim.split("\\s+"))
    val noisy = docs.filter(_._1 % 13 == 0).flatMap { case (id, text) =>
      text.trim.split("\\s+").filter(_.length >= 3).map { w =>
        val p = (id % w.length).toInt
        w.substring(0, p) + w.substring(p + 1)
      }
    }
    val freq = (clean ++ noisy).groupBy(identity).map {
      case (w, ws) => w -> ws.size.toLong
    }
    val vocab = freq.keys.toIndexedSeq.sorted
    val truth = (for {
      i <- vocab.indices.iterator
      j <- (i + 1) until vocab.size
      if math.abs(vocab(i).length - vocab(j).length) <= 1 // cheap prefilter
      if lev(vocab(i), vocab(j)) <= 1
    } yield (vocab(i), vocab(j))).toSet

    val got = graft.operators.TextOps.queries("x22_typo_canon")(
        spark, SparkTestBase.sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap

    assert(got.keySet === truth, "SymSpell candidates != brute-force truth")
    assert(truth.nonEmpty)
    for (((wa, wb), (dist, fa, fb, canon)) <- got) {
      assert(dist === lev(wa, wb).toLong)
      assert(fa === freq(wa) && fb === freq(wb), s"($wa,$wb) freqs")
      val expectCanon =
        if (fa > fb) wa else if (fb > fa) wb else Seq(wa, wb).min
      assert(canon === expectCanon)
    }
  }
}
