package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access layer over the driver-generated parquet test tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * Design notes (100 TB mindset):
  *  - Every reader is a plain parquet scan so Catalyst predicate pushdown,
  *    column pruning and partition pruning all apply; callers `select`/
  *    `filter` and the plan shows `PushedFilters`/narrow `ReadSchema`.
  *  - The `events` table ships nanosecond parquet timestamps, which Spark's
  *    vectorized reader rejects; we read them as raw nanos
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros —
  *    the same truncation DuckDB applies when casting TIMESTAMP_NS to
  *    TIMESTAMP, keeping both engines bit-identical.
  *  - Dimension tables (region/nation/supplier/part/customer at small SF)
  *    are the broadcast side of every join; see JoinOps.
  */
object Tables {

  /** Session settings every entry point applies. Mirrors the reference's
    * fixed-UTC date logic (ref docs/DEFINITIONS.md:23-26). */
  def configure(spark: SparkSession): SparkSession = {
    graft.plans.VectorExpressions.register(spark)
    graft.plans.SketchExpressions.register(spark)
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.parquet.aggregatePushdown", "true")
    // Wrapping 64-bit arithmetic for the hash families (MinHash affine
    // transforms, SimHash bit mixing) — ANSI overflow checking would
    // throw on intentional wraparound. Division-by-zero etc. are guarded
    // explicitly in the operators (see operators.dstd).
    c.set("spark.sql.ansi.enabled", "false")
    spark
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      // raw INT64 nanos -> TimestampType(micros); `div` floors, matching
      // DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // timezone-less micros (e.g. plain TIMESTAMP parquet) -> session-TZ
      // timestamp; session is pinned UTC so values are unchanged
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TimestampType
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
