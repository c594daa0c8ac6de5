package graft.operators

import graft.Tables
import graft.functions.CallFlatten
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed rows for p4's tree Dataset (top-level: Spark encoders can't
  * derive nested-struct schemas from inner classes). */
case class P4Child(l_linenumber: Int, section: String, method: String,
    qty: Double)
case class P4Tree(o_orderkey: Long, o_totalprice: Double,
    children: Seq[P4Child])

/** Projection / filter / flatten family — SURVEY.md §2.2 (the decode
  * pipeline shapes): JSON extraction (P3), recursive call flatten (P4),
  * noise suppression (P5), posexplode flatten (P8).
  *
  * p4 is the flagship: nested call-tree JSON documents are synthesized
  * per order from its lineitems (deterministic), then exploded by the
  * real recursive flattener (graft.functions.CallFlatten) inside a typed
  * `flatMap` — and the oracle reconstructs the expected rows relationally
  * (root = orders, leaves = non-suppressed lineitems), so the recursion
  * is verified against DuckDB, not just row-counted.
  */
object FlattenOps {

  // P3 — JSON param extraction + bucket aggregation
  // (ref indexer.js:3319 parseEvent; get_json_object on data column).
  private def p3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(floor(col("k") / 10).cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("n"), dsumOut(col("value")).as("sum_value"))
      .orderBy(col("k_bucket"))

  private val p3Sql =
    s"""SELECT CAST(floor(CAST(json_extract_string(props, '$$.k') AS INT) / 10.0) AS INT) AS k_bucket,
       | count(*) AS n, ${sqlDsumOut("\"value\"")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  // P5 — noise suppression by section:method key
  // (ref substrateetl.js:6446 suppress_call).
  private def p5(s: SparkSession, d: String): DataFrame = {
    val noise = Seq("view:0", "click:1", "error:2")
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("sm",
        concat(col("event_type"), lit(":"), pmod(col("k"), lit(3))))
      .filter(!col("sm").isin(noise: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("event_type"))
  }

  private val p5Sql =
    """SELECT event_type, count(*) AS n_kept
      |FROM (SELECT event_type,
      |  event_type || ':' ||
      |    (CAST(json_extract_string(props, '$.k') AS INT) % 3) AS sm
      | FROM events)
      |WHERE sm NOT IN ('view:0', 'click:1', 'error:2')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // P4 — recursive call flatten. Call trees are synthesized per order:
  // root = utility.batch carrying the order fee; children (in linenumber
  // order) = balances.transfer per line, except quantity-1 lines which
  // become system.remark — suppressed noise (P5) the flattener must drop.
  // The tree goes to the flattener as typed structs → CallNode, NOT via
  // to_json→re-parse (round-1's double round trip on the hottest query);
  // the JSON entry point is exercised by CallFlattenSpec + the ETL path.
  private def p4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val trees = li
      .withColumn("child", struct(
        col("l_linenumber").cast("int").as("l_linenumber"),
        when(col("l_quantity") < 2, "system").otherwise("balances")
          .as("section"),
        when(col("l_quantity") < 2, "remark").otherwise("transfer")
          .as("method"),
        col("l_quantity").as("qty")))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("child"))).as("children"))
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("children"))
    trees.as[P4Tree].flatMap { t =>
      val kids = t.children.map(c => CallFlatten.CallNode(
        c.section, c.method, s"""{"qty":${c.qty}}""", Seq.empty))
      val root = CallFlatten.CallNode("utility", "batch", "{}", kids)
      CallFlatten.flattenNode(root, Some(t.o_totalprice)).map { fc =>
        (t.o_orderkey, fc.call_id, fc.call_section, fc.call_method,
          fc.root, fc.leaf, fc.fee)
      }
    }.toDF("o_orderkey", "call_id", "call_section", "call_method",
        "root", "leaf", "fee")
      .orderBy(col("o_orderkey"), col("call_id"))
  }

  // Child index = position in the (linenumber, section, method, qty)
  // sort — mirrors Spark's sort_array struct comparison, including the
  // tie-break on duplicated linenumbers; suppressed children still
  // consume an index slot (they are dropped, not renumbered).
  private val p4Sql =
    """WITH kids AS (
      | SELECT l_orderkey, l_quantity,
      |  row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber,
      |      CASE WHEN l_quantity < 2 THEN 'system' ELSE 'balances' END,
      |      l_quantity) - 1 AS idx
      | FROM lineitem)
      |SELECT o_orderkey, '0' AS call_id, 'utility' AS call_section,
      | 'batch' AS call_method, TRUE AS root, FALSE AS leaf,
      | o_totalprice AS fee
      |FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
      |UNION ALL
      |SELECT l_orderkey AS o_orderkey,
      | '0_' || CAST(idx AS VARCHAR) AS call_id,
      | 'balances' AS call_section, 'transfer' AS call_method,
      | FALSE AS root, TRUE AS leaf, NULL AS fee
      |FROM kids WHERE l_quantity >= 2
      |ORDER BY o_orderkey, call_id""".stripMargin

  // P6 — duplicate-emit transfer dedup: parachains emit the same logical
  // transfer through several event paths; canonicalization keeps one row
  // per transfer identity and the audit compares raw vs deduped counts
  // (ref indexer.js:4228 map_feedTransfers_to_transfers; dup note
  // docs/DEFINITIONS.md:255-258; detector substrateetl.js:5324).
  private def p6(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val raw = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_raw"))
    val deduped = ev
      .dropDuplicates("user_id", "event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_dedup"))
    raw.join(deduped, Seq("event_type"))
      .withColumn("n_dups", col("n_raw") - col("n_dedup"))
      .orderBy(col("event_type"))
  }

  private val p6Sql =
    """SELECT r.event_type, r.n_raw, d.n_dedup, r.n_raw - d.n_dedup AS n_dups
      |FROM (SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1) r
      |JOIN (SELECT event_type, count(*) AS n_dedup FROM (
      |   SELECT DISTINCT user_id, event_type, "value" FROM events)
      |  GROUP BY 1) d
      | ON r.event_type = d.event_type
      |ORDER BY r.event_type""".stripMargin

  // P8 — posexplode digest-log flatten (ref substrateetl.js:6462-6473):
  // per-vector element statistics via explode.
  private def p8(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "e")))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        min(col("e").cast("double")).as("min_e"),
        max(col("e").cast("double")).as("max_e"),
        decOut(sum(dec12(col("e").cast("double") * col("e").cast("double"))),
          9).as("sum_sq"))
      .orderBy(col("vec_id"))

  private val p8Sql =
    s"""SELECT vec_id, count(*) AS n_dims,
       | min(CAST(e AS DOUBLE)) AS min_e, max(CAST(e AS DOUBLE)) AS max_e,
       | ${sqlDecOut("sum(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE) AS DECIMAL(38,12)))", 9)} AS sum_sq
       |FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings
       | WHERE vec_id < 50)
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p3_json_extract" -> (p3 _),
    "p4_call_flatten" -> (p4 _),
    "p5_noise_suppression" -> (p5 _),
    "p6_transfer_dedup" -> (p6 _),
    "p8_posexplode" -> (p8 _),
  )

  val oracles: Map[String, String] = Map(
    "p3_json_extract" -> p3Sql,
    "p4_call_flatten" -> p4Sql,
    "p5_noise_suppression" -> p5Sql,
    "p6_transfer_dedup" -> p6Sql,
    "p8_posexplode" -> p8Sql,
  )
}
