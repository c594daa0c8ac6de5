package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-view generation over the dump layout — SURVEY §2.1 S11 (ref
  * substrateetl.js:5874-6168 createDuneSectionMethodView /
  * postQueryToDune; schema/dune-generaterecent.sql): per chain, each
  * entity table gets a "recent" view = trailing 109-day window + the
  * per-table noise suppression, plus a cached-table (CTAS) form
  * partitioned by day for engines that want materialization.
  *
  * Two faces, same definitions:
  *  - [[viewSql]] / [[cachedTableSql]] emit the DDL text (the
  *    reference's generator posts these to Dune / BigQuery);
  *  - [[register]] binds the same window+filter as Spark temp views
  *    over the parquet layout, so the view tier is directly runnable
  *    and testable in-session — the p5 noise-filter query shape reads
  *    identically through it.
  */
object Views {

  /** The reference's trailing window: 109 days
    * (dune-generaterecent.sql TIMESTAMP_SUB(..., INTERVAL 109 DAY)). */
  val RecencyDays = 109

  /** Sentinel default for [[ViewSpec.partitionCol]] — resolved by
    * [[ViewSpec.layoutPartition]] from the spec's windowed/dimension
    * nature. */
  val DerivedPartition = "__derived__"

  /** One view definition: entity table, its time column, and the
    * (sectionCol, methodCol, suppressed-set) noise filter if any.
    * `tsCol = null` marks a DIMENSION table (assets, xcmassets,
    * chains — the reference's non-date-partitioned tables): the view
    * is the whole table, no recency window. `partitionCol` is the
    * layout's partition column for the CTAS face; the default DERIVES
    * it — log_dt for windowed tables, unpartitioned for dimensions —
    * so a new dimension spec cannot inherit a log_dt the table does
    * not carry (the blocklogstats bug class). Override where the
    * layout differs (month_dt, relay_chain). */
  final case class ViewSpec(table: String, tsCol: String,
      sectionCol: String = null, methodCol: String = null,
      noise: Seq[String] = Seq.empty,
      partitionCol: String = Views.DerivedPartition) {
    /** Resolved CTAS partition column, None = unpartitioned. */
    def layoutPartition: Option[String] = partitionCol match {
      case Views.DerivedPartition => Option(tsCol).map(_ => "log_dt")
      case null => None
      case c => Some(c)
    }
  }

  /** Per-table specs mirroring dune-generaterecent.sql:2-9 — the
    * extrinsics/events/calls noise lists are the reference's verbatim;
    * rewards/crowdloan ride the same window (new in this engine's
    * 8-table dump). */
  val defaultSpecs: Seq[ViewSpec] = Seq(
    ViewSpec("blocks", "block_time"),
    ViewSpec("extrinsics", "block_time", "section", "method", Seq(
      "paraInherent:enter", "imOnline:heartbeat",
      "electionProviderMultiPhase:submit",
      "parachainSystem:setValidationData",
      "parachainSystem:enactAuthorizedUpgrade")),
    ViewSpec("events", "block_time", "section", "method", Seq(
      "paraInclusion:CandidateBacked", "paraInclusion:CandidateIncluded")),
    ViewSpec("transfers", "block_time"),
    ViewSpec("calls", "block_time", "call_section", "call_method", Seq(
      "paraInherent:enter", "imOnline:heartbeat",
      "electionProviderMultiPhase:submit", "dappsStaking:claimStaker")),
    ViewSpec("logs", "block_time"),
    ViewSpec("rewards", "block_time"),
    ViewSpec("crowdloan", "block_time"),
    // the round-11 composition tables ride the same recency window
    // (the reference generates per-table views for every exported
    // table); stakings carries no per-row timestamp — its window runs
    // on the log_dt partition date (date ≥ anchor−109d, coerced)
    ViewSpec("traces", "block_time"),
    ViewSpec("balances", "block_time"),
    ViewSpec("stakings", "log_dt"),
    ViewSpec("xcmtransfers", "origination_ts"),
    ViewSpec("xcm", "origination_ts"),
    // the EVM-side export (EvmDump) rides the same window; the account
    // rollups window on their latest-touch ts like the reference's
    // accountsevm* date-suffixed tables
    ViewSpec("evmtxs", "block_timestamp"),
    ViewSpec("evmtransfers", "block_timestamp"),
    ViewSpec("accountsevmactive", "ts"),
    ViewSpec("accountsevmpassive", "ts"),
    // chain-metrics rollups window on their partition date
    ViewSpec("blocklog", "log_dt"),
    ViewSpec("blocklogstats", "month_dt", partitionCol = "month_dt"),
    // dimension snapshots: whole-table views, no window (the
    // reference's non-date-partitioned system/registry tables);
    // assets/xcmassets lay out by relay, chains is one flat table
    // (unpartitioned by derivation)
    ViewSpec("assets", null, partitionCol = "relay_chain"),
    ViewSpec("xcmassets", null, partitionCol = "relay_chain"),
    ViewSpec("chains", null),
    // the round-12 export surface: snapshots windows on its partition
    // date; the WASM contracts dataset and the account dims are
    // whole-table replaces (non-partitioned, the reference's bq load
    // --replace tier); democracy tables lay out per chain; the evm.*
    // dataset slice rides the block timestamp like evmtxs
    ViewSpec("snapshots", "log_dt"),
    ViewSpec("contracts", null),
    ViewSpec("contractscode", null),
    ViewSpec("contractscall", null),
    ViewSpec("votes", null, partitionCol = "chain_id"),
    ViewSpec("delegation", null, partitionCol = "chain_id"),
    ViewSpec("identity", null),
    ViewSpec("exchanges", null),
    ViewSpec("knownpubs", null))
  // (the evm.* dataset slice — logs/token_transfers — registers with
  // the SAME machinery against its own dataset root: its "logs" would
  // collide with the substrate digest-log table inside one catalog)

  private def noisePredicate(s: ViewSpec): Option[String] =
    if (s.noise.isEmpty) None
    else Some(s"concat(${s.sectionCol}, ':', ${s.methodCol}) NOT IN " +
      s.noise.map(n => s"'$n'").mkString("(", ", ", ")"))

  /** WHERE body of one view: trailing window (from `asOf`, or the
    * engine's current_timestamp when None — the reference form) +
    * noise filter. */
  private def whereBody(s: ViewSpec, asOf: Option[String]): String = {
    val anchor = asOf.map(t => s"TIMESTAMP '$t'")
      .getOrElse("current_timestamp()")
    val window = Option(s.tsCol)
      .map(c => s"$c >= $anchor - INTERVAL $RecencyDays DAYS")
    (window.toSeq ++ noisePredicate(s)).mkString(" AND ")
  }

  private def whereClause(s: ViewSpec, asOf: Option[String]): String = {
    val body = whereBody(s, asOf)
    if (body.isEmpty) "" else s" WHERE $body"
  }

  /** `CREATE OR REPLACE VIEW` DDL for one entity table of a chain's
    * dump layout (ref dune-generaterecent.sql view tier). Spark SQL
    * dialect: reads the parquet path directly. A dimension spec emits
    * the whole table. */
  def viewSql(chain: String, root: String, s: ViewSpec,
      asOf: Option[String] = None): String =
    s"CREATE OR REPLACE VIEW dune_${chain}_${s.table} AS " +
      s"SELECT * FROM parquet.`$root/${s.table}`" +
      whereClause(s, asOf)

  /** Cached-table (CTAS) twin, day-partitioned (ref
    * dune-generaterecent.sql `CREATE OR REPLACE TABLE … PARTITION BY
    * DATE(block_time)` tier; the dump layout already carries `log_dt`,
    * so partitioning reuses it instead of re-deriving DATE(ts)).
    * Emitted as DROP-IF-EXISTS + CREATE because `CREATE OR REPLACE
    * TABLE … AS SELECT` needs a v2 catalog — the pair runs on the
    * stock v1 session catalog (EtlSpec executes it). The partition
    * column follows the spec's LAYOUT column (month_dt for
    * blocklogstats, relay_chain for the registry dims, none for
    * chains — the reference loads the flat tables with a bare
    * `--replace`). */
  def cachedTableSqls(chain: String, root: String, s: ViewSpec,
      asOf: Option[String] = None): Seq[String] = Seq(
    s"DROP TABLE IF EXISTS dune_${chain}_cached_${s.table}",
    s"CREATE TABLE dune_${chain}_cached_${s.table} " +
      "USING PARQUET " +
      s.layoutPartition.map(c => s"PARTITIONED BY ($c) ")
        .getOrElse("") +
      s"AS SELECT * FROM parquet.`$root/${s.table}`" +
      whereClause(s, asOf))

  /** Emit the whole DDL script for a chain, one statement per spec in
    * spec order (no filesystem checks — text generation is pure; pair
    * it with [[tablesWithData]] to restrict to populated tables). */
  def script(chain: String, root: String, specs: Seq[ViewSpec],
      asOf: Option[String] = None, cached: Boolean = false): String =
    specs.flatMap(s =>
      if (cached) cachedTableSqls(chain, root, s, asOf)
      else Seq(viewSql(chain, root, s, asOf))).mkString(";\n") + ";"

  /** The specs whose table directory holds at least one parquet file —
    * an empty entity table (a day with no crowdloans writes only
    * _SUCCESS) has no footers to infer a view schema from. Checked
    * through the path's Hadoop FileSystem like the writer tier. */
  def tablesWithData(spark: SparkSession, root: String,
      specs: Seq[ViewSpec] = defaultSpecs): Seq[ViewSpec] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    specs.filter { s =>
      val p = new Path(s"$root/${s.table}")
      val fs = p.getFileSystem(conf)
      def hasParquet(d: Path): Boolean = fs.exists(d) &&
        fs.listStatus(d).exists(f =>
          if (f.isDirectory) hasParquet(f.getPath)
          else f.getPath.getName.endsWith(".parquet"))
      hasParquet(p)
    }
  }

  /** Runnable face: register each view as a Spark temp view over the
    * dump layout — same window, same noise filter — and return the
    * frames. `asOf` is explicit for determinism (tests pin it).
    * Tables with no parquet footprint yet are SKIPPED (absent from the
    * returned map): an empty day cannot define a view schema, and
    * Dump.dumpDay legitimately writes empty rewards/crowdloan tables. */
  def register(spark: SparkSession, chain: String, root: String,
      asOf: java.sql.Timestamp,
      specs: Seq[ViewSpec] = defaultSpecs): Map[String, DataFrame] =
    tablesWithData(spark, root, specs).map { s =>
      val whole = spark.read.parquet(s"$root/${s.table}")
      val base =
        if (s.tsCol == null) whole // dimension: the whole table
        else whole.filter(col(s.tsCol) >=
          lit(asOf) - expr(s"INTERVAL $RecencyDays DAYS"))
      val filtered = noisePredicate(s) match {
        case Some(p) => base.filter(expr(p))
        case None => base
      }
      filtered.createOrReplaceTempView(s"dune_${chain}_${s.table}")
      s.table -> filtered
    }.toMap
}
