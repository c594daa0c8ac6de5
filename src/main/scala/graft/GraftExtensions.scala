package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{AsOfStrategy, CompactDecode, CosineSimilarity, DotProduct}

/** Cluster-installable entry point for everything this library injects
  * into Catalyst — set
  * `spark.sql.extensions=graft.GraftExtensions`
  * on any session (including Connect / Thrift / notebook deployments
  * where driver code can't call our register helpers) and the custom
  * physical strategy plus the native expressions are present from the
  * first query:
  *
  *  - the as-of join planner strategy (AsOfJoinPlan → sorted-merge
  *    AsOfJoinExec);
  *  - `cosine_sim` / `dot_product` (fused vector kernels);
  *  - `compact_decode` (SCALE compact, codegen'd).
  *
  * The in-code helpers ([[graft.plans.AsOfJoin.asof]],
  * [[graft.functions.Udfs.register]], …) remain and are idempotent
  * alongside this, so library users who never touch Spark conf lose
  * nothing. The StaticInvoke-based scalar surface still needs
  * `Udfs.register` (it carries per-chain parser state, a session-level
  * concern, not a Catalyst one).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, "", name, usage, "", "", "",
        "", "", "", "built-in"),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    ext.injectFunction(fn("cosine_sim",
      "cosine_sim(a, b) - fused float64 cosine over two float arrays",
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction(fn("dot_product",
      "dot_product(a, b) - fused float64 dot over two float arrays",
      exprs => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction(fn("compact_decode",
      "compact_decode(hex) - leading SCALE-compact value, null on bad input",
      exprs => CompactDecode(exprs.head)))
    ext.injectFunction(fn("bottom_k_hv",
      "bottom_k_hv(h, v, k) - deterministic bottom-k-by-hash sketch " +
        "(array<struct<h,v>> ascending)",
      graft.plans.SketchExpressions.build))
  }
}
