package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter decontamination (c2) internals: the md5-window position
  * family matches a sequential reference, membership has no false
  * negatives, and a shrunken bit space forces (and exactly predicts) the
  * false-positive set.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Sequential reference of the position family: disjoint 8-hex windows
    * of md5, parsed base-16, mod the bit space, deduplicated. */
  private def refPositions(s: String, bits: Int): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (0 until 3).map(j =>
      java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % bits)
      .toSet
  }

  private val words =
    (0 until 200).map(i => s"tok${i * 7919 % 997} gram$i x${i % 13}")

  test("positions match the sequential md5 reference") {
    for (bits <- Seq(64, 65536)) {
      val got = words.toDF("w")
        .select(col("w"), DedupOps.bloomPositions(col("w"), bits).as("ps"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[Long](1).toSet).toMap
      for (w <- words) assert(got(w) === refPositions(w, bits), s"w=$w bits=$bits")
    }
  }

  test("no false negatives; tiny bit space forces exactly-predicted FPs") {
    val eval = words.take(40)
    val train = words.drop(40) ++ eval.take(10) // 10 true members
    val bits = 64
    val evalBits = eval.flatMap(refPositions(_, bits)).toSet
    val predicted = train.distinct
      .filter(w => refPositions(w, bits).subsetOf(evalBits)).toSet

    val bitsDf = eval.toDF("w")
      .select(explode(DedupOps.bloomPositions(col("w"), bits)).as("bit"))
      .distinct()
    val probed = train.distinct.toDF("w")
      .select(col("w"), size(DedupOps.bloomPositions(col("w"), bits)).as("need"),
        explode(DedupOps.bloomPositions(col("w"), bits)).as("bit"))
      .join(broadcast(bitsDf), Seq("bit"))
      .groupBy(col("w"), col("need")).agg(count(lit(1)).as("got"))
      .filter(col("got") === col("need"))
      .collect().map(_.getString(0)).toSet

    assert(probed === predicted)
    // every true member flagged (no false negatives)
    assert(eval.take(10).toSet.subsetOf(probed))
    // 64 bits under 40*3 inserts saturates -> the FP path is exercised
    assert((predicted -- eval.take(10).toSet).nonEmpty)
  }
}
