package graft

import graft.etl.AccountRelations
import graft.streaming.EventStream
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Relation tables maintained FROM A STREAM (the reference mutates
  * proxyaccount rows incrementally while indexing): decoded call rows
  * land as NDJSON files, a checkpointed streaming query appends them to
  * a bronze actions table with exactly-once file semantics, and the
  * relation build over the accumulated bronze resolves latest-wins
  * state across stream restarts — an addProxy landed before a restart
  * is tombstoned by a removeProxy landed after it. */
class StreamingRelationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val callSchema = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("extrinsic_id", StringType),
    StructField("block_number", LongType),
    StructField("call_id", StringType),
    StructField("call_section", StringType),
    StructField("call_method", StringType),
    StructField("call_args", StringType)))

  private def esc(json: String): String = json.replace("\"", "\\\"")

  test("streamed call landings maintain proxy edges across restart") {
    val root = Files.createTempDirectory("graft_srel").toString
    val landing = s"$root/landing"; val bronze = s"$root/bronze"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(landing))

    def land(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(s"$root/$name.tmp")
      Files.writeString(tmp, lines.mkString("\n"))
      Files.move(tmp, Paths.get(s"$landing/$name"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def run(): Unit = {
      val q = EventStream.jsonFileSource(spark, landing, callSchema)
        .writeStream
        .format("parquet")
        .option("path", bronze)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming batch timed out")
      q.stop()
    }

    val extrinsics = Seq(("1-0", "0xaa"), ("2-0", "0xaa"))
      .toDF("extrinsic_id", "signer_pub_key")
    val addArgs =
      esc("""{"delegate":"0xbb","proxyType":{"variant":"Any"},"delay":0}""")

    land("b1.json", Seq(
      s"""{"chain_id":0,"extrinsic_id":"1-0","block_number":1,""" +
        s""""call_id":"0","call_section":"proxy",""" +
        s""""call_method":"addProxy","call_args":"$addArgs"}"""))
    run()
    val afterAdd = AccountRelations.proxyAccounts(
        spark.read.parquet(bronze), extrinsics)
      .collect().map(r => (r.getAs[String]("delegator_pub"),
        r.getAs[String]("delegate_pub")))
    assert(afterAdd.toSeq == Seq(("0xaa", "0xbb")))

    // stream is down; the tombstone lands; a restarted query picks up
    // ONLY the new file (checkpoint) and the rebuild flips the edge
    land("b2.json", Seq(
      s"""{"chain_id":0,"extrinsic_id":"2-0","block_number":2,""" +
        s""""call_id":"0","call_section":"proxy",""" +
        s""""call_method":"removeProxy","call_args":"$addArgs"}"""))
    run()
    val bronzeDf = spark.read.parquet(bronze)
    assert(bronzeDf.count() == 2, "exactly-once: one row per landed call")
    val afterRemove = AccountRelations.proxyAccounts(bronzeDf, extrinsics)
    assert(afterRemove.isEmpty)
  }
}
