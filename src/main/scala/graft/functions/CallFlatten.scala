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

  private val mapper = new ObjectMapper()

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
      suppressed: Set[String] = DefaultSuppressed): Seq[FlatCall] = {
    val rootNode = mapper.readTree(json)
    val out = ArrayBuffer.empty[FlatCall]

    def walk(node: JsonNode, path: String, isRoot: Boolean): Unit = {
      val section = Option(node.get("section")).map(_.asText).getOrElse("")
      val method = Option(node.get("method")).map(_.asText).getOrElse("")
      if (!isRoot && suppressed.contains(s"$section:$method")) return
      val children = Option(node.get("calls"))
        .filter(_.isArray).map(_.elements().asScala.toSeq)
        .getOrElse(Seq.empty)
      val args = Option(node.get("args")).map(_.toString).getOrElse("{}")
      out += FlatCall(path, section, method, args,
        root = isRoot, leaf = children.isEmpty,
        fee = if (isRoot) rootFee else None)
      children.zipWithIndex.foreach { case (c, i) =>
        walk(c, s"${path}_$i", isRoot = false)
      }
    }

    walk(rootNode, "0", isRoot = true)
    out.toSeq
  }
}
