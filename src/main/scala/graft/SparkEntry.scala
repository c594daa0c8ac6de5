package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2) re-expressed
  * Spark-first over the driver's synthetic tables; `oracleSql` carries the
  * DuckDB twin of every SQL-expressible query (same column names, same
  * deterministic arithmetic — see graft.operators package doc). Queries
  * with no oracle entry (hash-based dedup, HLL) get the driver's
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary — scan + filter + hash agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("p0_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Flagship.queries ++
      Aggregates.queries ++
      JoinOps.queries ++
      WindowOps.queries ++
      TextOps.queries ++
      PipelineOps.queries ++
      GovOps.queries ++
      GraphOps.queries ++
      DexOps.queries ++
      DedupOps.queries ++
      VectorOps.queries ++
      MultimodalOps.queries ++
      FlattenOps.queries ++
      KeyOps.queries ++
      ContractOps.queries ++
      DimOps.queries ++
      SnapshotOps.queries ++
      graft.etl.WriterQueries.queries ++
      graft.streaming.StreamQueries.queries

  def oracleSql: Map[String, String] =
    Flagship.oracles ++
      Aggregates.oracles ++
      JoinOps.oracles ++
      WindowOps.oracles ++
      TextOps.oracles ++
      PipelineOps.oracles ++
      GovOps.oracles ++
      GraphOps.oracles ++
      DexOps.oracles ++
      DedupOps.oracles ++
      VectorOps.oracles ++
      MultimodalOps.oracles ++
      FlattenOps.oracles ++
      KeyOps.oracles ++
      ContractOps.oracles ++
      DimOps.oracles ++
      SnapshotOps.oracles ++
      graft.etl.WriterQueries.oracles ++
      graft.streaming.StreamQueries.oracles

  /** The single manifest of deliberately rows-only queries (no SQL oracle
    * exists: engine-specific hash/sketch layouts or the media-decode stub).
    * Every entry here must carry ScalaTest ground-truth pins instead
    * (DedupPropertySpec, HyperplaneLshSpec, TextPropertySpec, …).
    * OperatorSmokeSpec asserts `queries.keySet -- oracleSql.keySet` equals
    * exactly this set, so adding a query without an oracle entry fails the
    * suite unless it is consciously registered here. */
  val rowsOnly: Set[String] = Set(
    "a16b_approx_distinct", // HLL sketch — engine-specific binary
                            // (the deterministic KMV twin
                            // a16c_kmv_distinct IS oracled)
    "x8_approx_quantiles")  // KLL/GK sketch — engine-specific (the
                            // deterministic sample twin
                            // x18_sample_quantiles IS oracled)
}

/** The headline pricing-summary query (TPC-H Q1 shape — the canonical
  * scan+agg the reference's update_blocklog_bulk resembles,
  * ref substrateetl.js:9448-9451). */
object Flagship {
  import org.apache.spark.sql.functions._

  private def p0(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsumOut(col("l_quantity")).as("sum_qty"),
        dsumOut(col("l_extendedprice")).as("sum_base_price"),
        decOut(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
          .as("sum_disc_price"),
        decOut(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))))).as("sum_charge"),
        dmean(col("l_quantity")).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val p0Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${sqlDsumOut("l_quantity")} AS sum_qty,
       | ${sqlDsumOut("l_extendedprice")} AS sum_base_price,
       | ${sqlDecOut("sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))")} AS sum_disc_price,
       | ${sqlDecOut("sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6)))")} AS sum_charge,
       | ${sqlDmean("l_quantity")} AS avg_qty,
       | ${sqlDmean("l_extendedprice")} AS avg_price,
       | ${sqlDmean("l_discount")} AS avg_disc,
       | count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("p0_pricing_summary" -> (p0 _))
  val oracles: Map[String, String] = Map("p0_pricing_summary" -> p0Sql)
}
