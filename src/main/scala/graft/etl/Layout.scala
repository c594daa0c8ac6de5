package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for 100 TB operation — SURVEY §4's manual
  * optimizations re-expressed as Spark layout policy:
  *
  *  - **Bucketing** (ref: BigTable row-key design / per-chain MySQL
  *    sharding): persist both sides of a recurring big join bucketed and
  *    sorted on the join key → sort-merge join with NO shuffle on every
  *    subsequent read (verified by LayoutSpec: the joined plan contains
  *    zero Exchange nodes).
  *  - **Sorted-by-key writes** (ref README.md:187 8-hex block-number
  *    keys): sortWithinPartitions on (chain, number) gives parquet
  *    min/max page pruning for the point/range serving queries.
  *  - **Salting** (ref polkaholic:112-130 `bn % nmax` shard split): skew
  *    mitigation for hot keys when AQE's skew-join splitting isn't
  *    available (e.g. aggregation skew).
  */
object Layout {

  /** Persist a DataFrame bucketed+sorted by the join key. Reading both
    * tables back joins without any Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)

  /** Date-partitioned + key-sorted layout for serving-range scans. */
  def writeSortedPartitions(df: DataFrame, path: String,
      partitionCol: String, sortCols: Seq[String]): Unit =
    df.repartition(col(partitionCol))
      // lead with the partition column: FileFormatWriter requires an
      // ordering on partition columns and would re-sort (unstably,
      // destroying the key order) if it isn't already satisfied
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Streaming appends (foreachBatch
    * micro-batches, per-trigger file sinks) leave thousands of tiny
    * files whose open/footer cost dominates scans at fleet scale —
    * periodic compaction is the standard counter-measure. A
    * partition-layout directory (day=X/ subdirs) is compacted LEAF BY
    * LEAF, preserving the layout and the partition columns.
    * `sortCols` (optional) restores the min/max-pruning order a
    * streaming sink interleaved away.
    *
    * Swap semantics (plain filesystem — the Delta/Iceberg-less
    * stand-in, like Writers.upsert): the rewrite lands in a temp dir
    * first, then two renames swap it in. The window between the
    * renames is NOT atomic — a concurrent reader can see
    * path-not-found for a moment (table formats solve this with
    * metadata pointers; on plain parquet, schedule compaction in the
    * maintenance window the reference uses for its own `--replace`
    * loads). The reader contract is pinned by LayoutSpec: compacted
    * file names never collide with the old generation's, so a reader
    * holding the PRE-compaction file list either completes on the old
    * listing or fails loudly with file-not-found — it can never
    * silently return a mix of generations. If the second rename fails
    * the original directory is rolled back into place and the temp
    * dir removed before erroring, so data is never left stranded.
    *
    * All listing/rename/delete goes through the path's Hadoop
    * [[org.apache.hadoop.fs.FileSystem]] (like Writers.deleteKeys), so
    * the same code compacts local, HDFS, and s3a layouts — java.io
    * would silently see an empty directory on any non-local FS. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path.stripSuffix("/"))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val kids = if (fs.exists(p)) fs.listStatus(p)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val partDirs = kids.filter { f =>
      val n = f.getPath.getName
      f.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
        !n.endsWith("._compact_tmp") && !n.endsWith("._compact_old")
    }
    if (partDirs.nonEmpty)
      return partDirs.map(d =>
        compact(spark, d.getPath.toString, targetBytes, sortCols)).sum
    val bytes = kids
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df0 = spark.read.parquet(path).coalesce(nFiles)
    val df = if (sortCols.isEmpty) df0
      else df0.sortWithinPartitions(sortCols.map(col): _*)
    val tmp = new Path(p.toString + "._compact_tmp")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new Path(p.toString + "._compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(p, bak)) {
      fs.delete(tmp, true)
      sys.error(s"compact: cannot move $path aside")
    }
    if (!fs.rename(tmp, p)) {
      val restored = fs.rename(bak, p) // roll the original back
      fs.delete(tmp, true)
      if (restored)
        sys.error(s"compact: swap failed for $path; original restored")
      else
        sys.error(s"compact: swap failed for $path AND rollback failed" +
          s" — the original data is intact in $bak; restore it manually")
    }
    fs.delete(bak, true)
    nFiles
  }

  /** Spread the low 16 bits of `c` to even positions (classic
    * bit-twiddling spread via magic masks — public domain technique). */
  private def spreadBits(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Morton (z-order) interleave of two non-negative 16-bit dimensions:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Rows close
    * in BOTH dimensions get close z-values. */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spreadBits(a), 1).bitwiseOR(spreadBits(b))

  /** Z-order-clustered layout: range-partition + sort by the interleaved
    * key so parquet min/max stats (and the range partitioning itself)
    * prune on BOTH dimensions of a 2-d selection — the multi-dimensional
    * complement of [[writeSortedPartitions]]'s single-key clustering.
    * A (chain, block) or (day, account-prefix) box query at 100 TB reads
    * a handful of z-contiguous files instead of one full dimension's
    * stripe. Callers pre-scale each dimension into [0, 2^16). */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      partitions: Int): Unit =
    df.withColumn("_z", zValue(col(a), col(b)))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** Aggregate functions that re-combine correctly from salted partials
    * (count partials re-finish with sum; avg etc. would be WRONG). */
  private val decomposable = Set("sum", "count", "min", "max")

  /** Salt a hot grouping key into `n` subkeys; aggregate partially on
    * (key, salt), then finish on key — two small shuffles instead of one
    * skewed one. Only decomposable aggregates are accepted.
    *
    * The salt is a pure function of row content (`hash` over
    * `saltCols`, defaulting to every hashable column), so task
    * retries/recomputation assign each row to the same salt group —
    * results were already correct with a random salt (decomposable
    * aggs), but a stable salt keeps skew diagnostics reproducible.
    * CAVEAT: content-identical duplicate rows share a salt group; for
    * duplicate-heavy skew pass `saltCols` naming a distinguishing
    * attribute (an event id, a block number). Map-typed columns are
    * excluded from the default (Spark's `hash` rejects MapType). */
  def saltedAgg(df: DataFrame, key: String, n: Int,
      aggs: Seq[(String, String)],
      saltCols: Seq[String] = Nil): DataFrame = {
    require(aggs.nonEmpty && aggs.forall(a => decomposable(a._2)),
      s"saltedAgg supports only ${decomposable.mkString("/")} " +
        "(non-decomposable aggregates would re-finish incorrectly)")
    val hashCols =
      if (saltCols.nonEmpty) saltCols
      else df.schema.fields.filterNot(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(_.name).toSeq
    val salted = df.withColumn("_salt",
      pmod(hash(hashCols.map(col): _*), lit(n)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head match { case (c, f) => expr(s"$f($c)").as(s"_p0") },
        aggs.tail.zipWithIndex.map { case ((c, f), i) =>
          expr(s"$f($c)").as(s"_p${i + 1}")
        }: _*)
    // re-aggregate the partials (sum/count/min/max are decomposable;
    // count partials re-combine with sum)
    val finals = aggs.zipWithIndex.map { case ((c, f), i) =>
      val refinish = if (f == "count") "sum" else f
      expr(s"$refinish(_p$i)").as(s"${f}_$c")
    }
    partial.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }
}
