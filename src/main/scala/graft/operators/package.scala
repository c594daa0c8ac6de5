package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared expression helpers for the operator library.
  *
  * Determinism contract: every query result must hash-match a DuckDB oracle
  * run on the same parquet. Floating-point SUMs are order-dependent, and
  * Spark's partial aggregation order is nondeterministic — so all sums go
  * through fixed-scale decimals (exact, associative, order-independent),
  * and all ratios/avgs are derived from those exact sums with a single
  * IEEE-754 double expression that both engines evaluate identically.
  */
package object operators {

  /** Exact-sum cast: DECIMAL(38,6) carries anything up to ~1e31 with
    * micro-unit precision — the same trick the reference uses when it keeps
    * NUMERIC `raw_amount` next to FLOAT `amount`
    * (ref substrate/schema/substrateetl/transfers.json). */
  def dec6(c: Column): Column = c.cast("decimal(38,6)")

  /** Higher-scale variant for tiny magnitudes (vector components, ratios). */
  def dec12(c: Column): Column = c.cast("decimal(38,12)")

  /** Driver-side twin of [[dec12]]: the per-term rounding every
    * sequential trainer loop (kmeans, PCA moments, LR gradients) must
    * share with the distributed decimal cast — `BigDecimal.valueOf`
    * (the Double.toString repr) then scale-12 HALF_UP, which is what
    * both Spark's and DuckDB's DECIMAL(38,12) casts do. ONE copy so a
    * contract fix cannot land in one trainer and miss the others. */
  def bd12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)

  /** Spread a skinny scan across the scheduler before a CPU-bound
    * per-row stage (tokenize/shingle/hash): a sub-128 MB parquet
    * arrives as ONE input partition, so such a pass runs
    * single-threaded regardless of cores (measured 7× at sf0.1 and
    * 24× at ×10 on the BPE tokenize). Repartitions ONLY when the
    * plan's parallelism is below the session default — at real scale
    * the file count already provides parallelism and this adds no
    * shuffle. Apply AFTER pushed-down filters so pruning still reaches
    * the scan. */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact decimal sum of a double column. */
  def dsum(c: Column): Column = sum(dec6(c))

  /** Driver-hash-safe sum for FINAL projections: the exact decimal sum,
    * rendered as a rounded double. Spark DECIMAL(38,6) and DuckDB DECIMAL
    * hash differently at the driver gate even when numerically equal;
    * a rounded double is bit-identical in both engines (the j13/a8/v3
    * template). Use `dsum` for intermediate arithmetic, `dsumOut` at the
    * query surface. */
  def dsumOut(c: Column): Column = round(dsum(c).cast("double"), 6)

  /** Final-projection rendering of an already-computed decimal aggregate
    * (e.g. `sum(when(..., dec6(c)))`): rounded double, engine-identical. */
  def decOut(c: Column, scale: Int = 6): Column =
    round(c.cast("double"), scale)

  /** Deterministic mean from exact sums: double division is a single IEEE
    * op, identical in Spark and DuckDB. */
  def dmean(c: Column): Column =
    round(dsum(c).cast("double") / count(lit(1)), 6)

  /** Deterministic sample stddev from exact sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)). All inputs exact decimals, the final
    * arithmetic a fixed double expression → engine-identical
    * (ref substrateetl.js:3983-3995 uses SQL STDDEV; we re-derive it so the
    * result is order-independent). */
  def dstd(c: Column): Column = {
    val n = count(lit(1)).cast("double")
    val s = dsum(c).cast("double")
    val s2 = sum(dec6(c * c)).cast("double")
    when(count(lit(1)) > 1,
      round(sqrt((s2 - s * s / n) / (n - lit(1.0))), 6))
  }

  /** One per-JVM parent for the write-path queries' scratch dumps
    * (k11/b4/j26 write a layout and read it back, so the files must
    * outlive the query — but NOT the process): a shutdown hook deletes
    * the whole tree, so repeated bench reps leave no disk residue on
    * the host (the stage:dump_day convention, made reusable). */
  private lazy val queryDumpRoot: java.nio.file.Path = {
    val root =
      java.nio.file.Files.createTempDirectory("graft_query_dumps")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(root.toFile)
    }
    root
  }

  /** Fresh scratch dir under [[queryDumpRoot]] — use instead of a bare
    * createTempDirectory in any query that writes parquet. */
  def queryDumpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(queryDumpRoot, prefix)
      .toString

  /** Synthetic 32-byte pubkey hex from a string seed — the one
    * md5-based scheme every oracle that exercises ss58/identity
    * surfaces re-derives in DuckDB as
    * `'0x' || md5(seed) || md5(seed || 'x')`. Keep Scala and SQL in
    * lockstep: changing this formula means changing every oracle twin
    * that spells it out (i1, i4, b15, b16, ...). */
  def synthPk(seed: Column): Column =
    concat(lit("0x"), md5(seed.cast("binary")),
      md5(concat(seed, lit("x")).cast("binary")))

  /** Bare 40-hex synthetic address body — the synthetic pubkey's first
    * 40 hex chars (one md5 is only 32, so two halves slice to 40).
    * DuckDB twin: `substr(md5(seed) || md5(seed || 'x'), 1, 40)`. */
  def synthHex40(seed: Column): Column =
    substring(concat(md5(seed.cast("binary")),
      md5(concat(seed, lit("x")).cast("binary"))), 1, 40)

  /** Synthetic H160 (EVM address) from a string seed — a REAL 42-char
    * `0x` + 40-hex address, so fixtures exercise the exact address
    * length (e.g. the dune render guard's `length > 42` boundary).
    * DuckDB twin: `'0x' || substr(md5(seed) || md5(seed || 'x'), 1,
    * 40)`. */
  def synthH160(seed: Column): Column =
    concat(lit("0x"), synthHex40(seed))

  /** UTC day key as a string — unambiguous across engines. */
  def dayKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** UTC hour key. */
  def hourKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH")

  /** Month key. */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** Epoch microseconds as BIGINT — the exact representation of a
    * timestamp, avoiding engine-specific timestamp rendering. */
  def us(ts: Column): Column = unix_micros(ts)

  // ---- Oracle-side (DuckDB SQL) twins of the helpers above ----
  /** events.ts is TIMESTAMP_NS in DuckDB; CAST truncates to micros exactly
    * like our `timestamp_micros(ts div 1000)` load path. */
  val TS = "CAST(ts AS TIMESTAMP)"
  def sqlDsum(x: String): String = s"sum(CAST($x AS DECIMAL(38,6)))"

  /** Oracle twin of [[dsumOut]]. */
  def sqlDsumOut(x: String): String =
    s"round(CAST(${sqlDsum(x)} AS DOUBLE), 6)"

  /** Oracle twin of [[decOut]] for an arbitrary decimal expression. */
  def sqlDecOut(x: String, scale: Int = 6): String =
    s"round(CAST($x AS DOUBLE), $scale)"

  /** DuckDB `sum(BIGINT)` widens to HUGEINT (int128) while Spark stays
    * BIGINT — the driver's value hash sees them as different. Pin the
    * oracle's integer sums back to BIGINT. */
  def sqlLsum(x: String): String = s"CAST(sum($x) AS BIGINT)"
  def sqlDmean(x: String): String =
    s"round(CAST(${sqlDsum(x)} AS DOUBLE) / count(*), 6)"
  def sqlDstd(x: String): String =
    s"CASE WHEN count(*) > 1 THEN " +
      s"round(sqrt((CAST(sum(CAST(($x)*($x) AS DECIMAL(38,6))) AS DOUBLE) - " +
      s"CAST(${sqlDsum(x)} AS DOUBLE)*CAST(${sqlDsum(x)} AS DOUBLE)/count(*)) / " +
      s"(count(*) - 1.0)), 6) END"
  def sqlDay(ts: String): String = s"strftime($ts, '%Y-%m-%d')"
  def sqlHour(ts: String): String = s"strftime($ts, '%Y-%m-%d %H')"
  def sqlMonth(ts: String): String = s"strftime($ts, '%Y-%m')"
  def sqlUs(ts: String): String = s"epoch_us($ts)"
}
