package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth properties for the rows-only LSH query (d3 has no
  * DuckDB oracle because its hash family is engine-specific — these
  * properties are what make "rows-only" trustworthy):
  *  - PRECISION = 1.0 exactly: every emitted pair truly has word-set
  *    Jaccard ≥ 0.5 (the in-query exact verify actually works);
  *  - CLUSTER RECALL on strong pairs (Jaccard ≥ 0.8) is high: hot
  *    buckets emit star edges rather than all k²/2 pairs, so the
  *    correct downstream property is "both docs land in the same
  *    connected component of the candidate graph" — with 8 bands × 4
  *    rows, P[bucket hit] = 1−(1−s⁴)⁸ ≈ 0.99 at s = 0.8.
  * Ground truth is computed exhaustively in-process (the doc cap keeps
  * this a few hundred docs at test scale). This spec is what caught
  * the round-1 hot-bucket DROP policy silently losing the biggest
  * duplicate clusters (cluster recall was 8%). */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val docs: Seq[(Long, Set[String])] = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, SparkTestBase.sf)
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split("\\s+").toSet))
      .toSeq
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private lazy val truth: Map[(Long, Long), Double] = (for {
    i <- docs.indices.iterator
    j <- (i + 1) until docs.size
    sim = jaccard(docs(i)._2, docs(j)._2)
    if sim >= 0.5
  } yield {
    val (a, b) = (docs(i)._1, docs(j)._1)
    (math.min(a, b), math.max(a, b)) -> sim
  }).toMap

  private lazy val lsh: Set[(Long, Long)] =
    graft.operators.DedupOps.queries("d3_minhash_lsh")(
        spark, SparkTestBase.sf)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH precision is exactly 1.0 (every emitted pair is a true pair)") {
    val falsePos = lsh.filterNot(truth.contains)
    assert(falsePos.isEmpty, s"false positives: ${falsePos.take(5)}")
    assert(lsh.nonEmpty) // the fixture does contain near-dups
  }

  test("LSH cluster recall on strong pairs (Jaccard ≥ 0.8) is ≥ 0.95") {
    import spark.implicits._
    val strong = truth.filter(_._2 >= 0.8).keySet
    assert(strong.nonEmpty)
    // component labels of the candidate graph
    val label = graft.operators.DedupOps
      .connectedComponents(lsh.toSeq.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sameCluster = strong.count { case (a, b) =>
      label.get(a).exists(la => label.get(b).contains(la))
    }
    val recall = sameCluster.toDouble / strong.size
    assert(recall >= 0.95, s"cluster recall $recall ($sameCluster/${strong.size})")
  }

  test("containment pairs (d11) match the exhaustive truth exactly") {
    // exhaustive |A∩B| / min(|A|,|B|) over the same doc cap, same
    // source block, same round-at-4-then-threshold rule
    val bySrc = {
      import org.apache.spark.sql.functions._
      Tables.documents(spark, SparkTestBase.sf)
        .filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("source"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getString(2).trim.split("\\s+").toSet))
    }
    val truth = (for {
      i <- bySrc.indices.iterator
      j <- (i + 1) until bySrc.size
      if bySrc(i)._2 == bySrc(j)._2 // source-blocked, like the query
      (ia, ib) = if (bySrc(i)._1 < bySrc(j)._1) (i, j) else (j, i)
      (da, sa) = (bySrc(ia)._1, bySrc(ia)._3)
      (db, sb) = (bySrc(ib)._1, bySrc(ib)._3)
      c = BigDecimal(sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.8
    } yield (da, db) -> (if (sa.size <= sb.size) da else db, c)).toMap
    val got = graft.operators.DedupOps.queries("d11_containment")(
        spark, SparkTestBase.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === truth)
    assert(got.nonEmpty)
  }

  test("soft dedup mass: effective size = docs - clustered + clusters") {
    import org.apache.spark.sql.functions._
    // each cluster of size k contributes k*(1/k) = exactly 1 effective
    // doc, so total effective = (unclustered docs) + (cluster count):
    // the d10 rollup must reconcile with d5's cluster inventory
    val d10 = graft.operators.DedupOps.queries("d10_soft_dedup")(
      spark, SparkTestBase.sf)
      .agg(sum(col("n_docs")), sum(col("n_clustered")),
        sum(col("effective_docs"))).collect().head
    val (nDocs, nClustered, eff) =
      (d10.getLong(0), d10.getLong(1), d10.getDouble(2))
    val d5 = graft.operators.DedupOps.queries("d5_dup_clusters")(
      spark, SparkTestBase.sf).count() // one row per cluster
    assert(nClustered > 0 && d5 > 0)
    val expected = (nDocs - nClustered + d5).toDouble
    assert(math.abs(eff - expected) < 0.01,
      s"effective $eff vs $expected (docs $nDocs clustered $nClustered clusters $d5)")
  }
}
