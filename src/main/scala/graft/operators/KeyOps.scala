package graft.operators

import graft.Tables
import graft.functions.Udfs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-account-key operators — the §2.7/§2.8 scalar surface around
  * sovereign/multisig account derivation (ref xcmmanager.js:933
  * computeSovereignAccount feeding XCM fee attribution; paraTool.js:311
  * computeMultisig). The sovereign derivation is TrailingZeroInput
  * string assembly, so DuckDB can reconstruct it byte-for-byte — a real
  * cross-engine oracle for the derivation; the blake2-based multisig is
  * covered by CodecSpec golden vectors (no blake2 in DuckDB).
  *
  * Scale notes: the UDF is a pure per-row projection (no shuffle); the
  * derived-key join shuffles on the 66-char address exactly as a
  * production XCM-fee join would, and the dimension side broadcasts.
  */
object KeyOps {

  /** DuckDB twin of `sovereign_account(id, sibling)` for id < 65536:
    * prefix ++ u32-LE hex ++ zero padding to 32 bytes. */
  private def sqlSov(id: String, sibling: Boolean): String = {
    val prefixHex = if (sibling) "7369626c" else "70617261"
    s"'0x$prefixHex' || printf('%02x%02x0000', ($id) % 256, ($id) // 256)" +
      " || repeat('0', 48)"
  }

  // K1 — sovereign-account derivation per synthetic "parachain"
  // (n_nationkey + 1000), relay and sibling forms.
  private def k1(s: SparkSession, d: String): DataFrame = {
    Udfs.register(s)
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        (col("n_nationkey") + 1000).cast("long").as("para_id"))
      .selectExpr("n_nationkey",
        "sovereign_account(para_id, false) AS sovereign_para",
        "sovereign_account(para_id, true) AS sovereign_sibl")
      .orderBy(col("n_nationkey"))
  }

  private val k1Sql =
    s"""SELECT n_nationkey,
       | ${sqlSov("n_nationkey + 1000", sibling = false)} AS sovereign_para,
       | ${sqlSov("n_nationkey + 1000", sibling = true)} AS sovereign_sibl
       |FROM nation ORDER BY n_nationkey""".stripMargin

  // K2 — derived-key equi-join: both sides independently derive the
  // sovereign address from their own nation key and join ON the derived
  // key (the J10 shape the XCM-fee pipeline uses, ref xcmmanager.js:950).
  private def k2(s: SparkSession, d: String): DataFrame = {
    Udfs.register(s)
    val dim = Tables.nation(s, d)
      .selectExpr("n_name",
        "sovereign_account(CAST(n_nationkey + 1000 AS BIGINT), false) AS addr")
    val fact = Tables.supplier(s, d)
      .selectExpr(
        "sovereign_account(CAST(s_nationkey + 1000 AS BIGINT), false) AS addr")
      .groupBy(col("addr"))
      .agg(count(lit(1)).as("n_suppliers"))
    fact.join(broadcast(dim), Seq("addr"))
      .select(col("n_name"), col("addr"), col("n_suppliers"))
      .orderBy(col("n_name"))
  }

  private val k2Sql =
    s"""SELECT n_name, f.addr, n_suppliers
       |FROM (SELECT ${sqlSov("s_nationkey + 1000", sibling = false)} AS addr,
       |   count(*) AS n_suppliers
       |  FROM supplier GROUP BY 1) f
       |JOIN (SELECT n_name,
       |   ${sqlSov("n_nationkey + 1000", sibling = false)} AS addr
       |  FROM nation) d
       | ON f.addr = d.addr
       |ORDER BY n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k1_sovereign_accounts" -> (k1 _),
    "k2_derived_key_join" -> (k2 _),
  )

  val oracles: Map[String, String] = Map(
    "k1_sovereign_accounts" -> k1Sql,
    "k2_derived_key_join" -> k2Sql,
  )
}
