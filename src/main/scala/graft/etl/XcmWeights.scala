package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XCM per-instruction weight/fee model (ref xcmInstructions.js:1-253
  * `getInstructionSet`, which ships per-instruction refTime / db-reads /
  * db-writes benchmarks and uses them for message fee estimation).
  *
  * Re-expressed Spark-first: the model is a tiny static dimension (32
  * rows) broadcast-joined to per-message instruction lists, then rolled
  * up per message — at 100 TB the fact side streams map-side against
  * the broadcast dim and the only shuffle is the per-message
  * aggregation, which AQE coalesces. The refTime numbers are the
  * reference's published kusama/moonbeam benchmark values; instructions
  * the reference ships without a model carry zero weight (same
  * semantics as its undefined-model fallthrough).
  */
object XcmWeights {

  final case class InstructionWeight(instruction: String, refTime: Long,
      reads: Long, writes: Long)

  /** The reference's instruction model, in its declaration order
    * (xcmInstructions.js:4-253). */
  val model: Seq[InstructionWeight] = Seq(
    InstructionWeight("withdrawAsset", 20385000L, 1, 1),
    InstructionWeight("reserveAssetDeposited", 2000000000000L, 0, 0),
    InstructionWeight("receiveTeleportedAsset", 19595000L, 1, 1),
    InstructionWeight("queryResponse", 24677000L, 1, 0),
    InstructionWeight("transferAsset", 3275600L, 2, 2),
    InstructionWeight("transferReserveAsset", 50645000L, 8, 5),
    InstructionWeight("transact", 31693000L, 1, 0),
    InstructionWeight("hrmpNewChannelOpenRequest", 0L, 0, 0),
    InstructionWeight("hrmpChannelAccepted", 0L, 0, 0),
    InstructionWeight("hrmpChannelClosing", 0L, 0, 0),
    InstructionWeight("clearOrigin", 8268000L, 0, 0),
    InstructionWeight("descendOrigin", 9620000L, 0, 0),
    InstructionWeight("reportError", 24787000L, 5, 2),
    InstructionWeight("depositAsset", 21763000L, 1, 1),
    InstructionWeight("depositReserveAsset", 40930000L, 7, 4),
    InstructionWeight("exchangeAsset", 0L, 0, 0),
    InstructionWeight("initiateReserveWithdraw", 465091000L, 5, 2),
    InstructionWeight("initiateTeleport", 40788000L, 7, 4),
    InstructionWeight("queryHolding", 392845000L, 5, 2),
    InstructionWeight("buyExecution", 130464000L, 4, 0),
    InstructionWeight("refundSurplus", 25506000L, 0, 0),
    InstructionWeight("setErrorHandler", 8089000L, 0, 0),
    InstructionWeight("setAppendix", 8110000L, 0, 0),
    InstructionWeight("clearError", 8222000L, 0, 0),
    InstructionWeight("claimAsset", 17798000L, 1, 1),
    InstructionWeight("trap", 8424000L, 0, 0),
    InstructionWeight("subscribeVersion", 30071000L, 6, 3),
    InstructionWeight("unsubscribeVersion", 12915000L, 0, 1),
    InstructionWeight("burnAsset", 0L, 0, 0),
    InstructionWeight("expectAsset", 0L, 0, 0),
    InstructionWeight("expectOrigin", 0L, 0, 0),
    InstructionWeight("expectError", 0L, 0, 0))

  /** Substrate's published RocksDbWeight per-operation refTime costs —
    * the db term of `weight = refTime + reads·R + writes·W`. */
  val ReadWeight: Long = 25000000L
  val WriteWeight: Long = 100000000L

  /** The model as a DataFrame dimension, keyed by declaration index. */
  def dim(s: SparkSession): DataFrame = {
    import s.implicits._
    model.zipWithIndex
      .map { case (w, i) => (i, w.instruction, w.refTime, w.reads, w.writes) }
      .toDF("instr_idx", "instruction", "ref_time", "reads", "writes")
  }

  /** Per-message weight/fee rollup: `messages(msg_hash, instr_idx)`
    * (one row per instruction occurrence) × broadcast dim →
    * n_instr / total refTime / total db ops / total estimated weight. */
  def estimateFees(s: SparkSession, messages: DataFrame): DataFrame =
    messages.join(broadcast(dim(s)), Seq("instr_idx"))
      .groupBy(col("msg_hash"))
      .agg(count(lit(1)).as("n_instr"),
        sum(col("ref_time")).as("total_ref_time"),
        sum(col("reads")).as("total_reads"),
        sum(col("writes")).as("total_writes"),
        sum(col("ref_time") + col("reads") * ReadWeight +
          col("writes") * WriteWeight).as("est_weight"))

  /** The dimension as a SQL VALUES list — generated from the SAME
    * `model` Seq the Spark side joins, so the oracle twin can never
    * drift from the Scala dimension. */
  def dimSqlValues: String = model.zipWithIndex.map { case (w, i) =>
    s"($i, '${w.instruction}', CAST(${w.refTime} AS BIGINT), " +
      s"CAST(${w.reads} AS BIGINT), CAST(${w.writes} AS BIGINT))"
  }.mkString(",\n ")
}
