package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Recursive call flatten — the reference's UDTF-shaped operator that
  * explodes `utility.batch`/`proxy.proxy`/`multisig.asMulti` nested call
  * trees into flat `calls` rows with a path-style `call_id`, `root`/`leaf`
  * flags, and the fee attributed to the root call only
  * (ref indexer.js:3433 recursive_batch_all, assetManager.js:1922
  * paramToCalls; consumed at substrateetl.js:6403-6459).
  *
  * Implemented as a plain recursive Scala function used inside
  * `Dataset.flatMap` — no Catalyst `Generator` needed (SURVEY §7.3).
  */
object CallFlatten {

  /** One flattened call row. */
  case class FlatCall(
      call_id: String,
      call_section: String,
      call_method: String,
      call_args: String,
      root: Boolean,
      leaf: Boolean,
      fee: Option[Double])

  // shared across executor threads: safe — readTree is the only use and
  // ObjectMapper is thread-safe for read-only configuration
  private val mapper = new ObjectMapper()

  /** Parsed call-tree node — the JSON-independent input to the flattener.
    * The ETL path parses JSON into this; typed pipelines construct it
    * directly and skip the serialize+parse round trip entirely. */
  case class CallNode(section: String, method: String, args: String,
      calls: Seq[CallNode])

  /** Default per-chain noise set (ref substrateetl.js:6446 suppress_call;
    * schema/dune-generaterecent.sql:3-6). */
  val DefaultSuppressed: Set[String] =
    Set("system:remark", "paraInherent:enter", "imOnline:heartbeat",
      "timestamp:set")

  /** Flatten one call-tree JSON document:
    * `{"section":…,"method":…,"args":{…},"calls":[…]}`.
    * Fee lands only on the root row; suppressed (section:method) subtrees
    * are dropped (children included — matching the reference, which skips
    * the call row entirely). The root is never suppressed.
    */
  def flatten(json: String, rootFee: Option[Double],
      suppressed: Set[String] = DefaultSuppressed): Seq[FlatCall] =
    flattenNode(toNode(mapper.readTree(json)), rootFee, suppressed)

  /** Flatten a pre-parsed call tree (same recursion/suppression
    * semantics as the JSON entry point). */
  def flattenNode(root: CallNode, rootFee: Option[Double],
      suppressed: Set[String] = DefaultSuppressed): Seq[FlatCall] = {
    val out = ArrayBuffer.empty[FlatCall]

    def walk(node: CallNode, path: String, isRoot: Boolean): Unit = {
      if (!isRoot && suppressed.contains(s"${node.section}:${node.method}"))
        return
      out += FlatCall(path, node.section, node.method, node.args,
        root = isRoot, leaf = node.calls.isEmpty,
        fee = if (isRoot) rootFee else None)
      node.calls.zipWithIndex.foreach { case (c, i) =>
        walk(c, s"${path}_$i", isRoot = false)
      }
    }

    walk(root, "0", isRoot = true)
    out.toSeq
  }

  private def toNode(n: JsonNode): CallNode = CallNode(
    Option(n.get("section")).map(_.asText).getOrElse(""),
    Option(n.get("method")).map(_.asText).getOrElse(""),
    Option(n.get("args")).map(_.toString).getOrElse("{}"),
    Option(n.get("calls")).filter(_.isArray)
      .map(_.elements().asScala.toSeq.map(toNode)).getOrElse(Seq.empty))
}
