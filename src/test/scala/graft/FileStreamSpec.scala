package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Real file-source streaming E2E (S10/ST3): NDJSON files land in a
  * directory, a checkpointed streaming query projects them into a
  * parquet sink, the query is STOPPED, more files land, and a restarted
  * query picks up exactly the new files — no loss, no duplicates
  * (checkpoint + file-sink metadata = exactly-once). */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("file landing → checkpointed sink survives restart exactly-once") {
    val root = Files.createTempDirectory("graft_fs").toString
    val landing = s"$root/landing"; val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(landing))

    def land(name: String, rows: Seq[(Long, String, Double)]): Unit = {
      val tmp = Paths.get(s"$root/$name.tmp")
      Files.writeString(tmp, rows.map { case (i, t, v) =>
        s"""{"event_id":$i,"event_type":"$t","value":$v}"""
      }.mkString("\n"))
      // atomic move: the file source must never see a half-written file
      Files.move(tmp, Paths.get(s"$landing/$name"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def run(): Unit = {
      val q = EventStream.jsonFileSource(spark, landing, schema)
        .filter(col("event_type") =!= "noise")
        .withColumn("value_2x", col("value") * 2)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // AvailableNow terminates on its own; a false return means the
      // batch timed out (steal storm) — fail HERE, not at a later count
      assert(q.awaitTermination(120000), "streaming batch timed out")
      q.stop()
    }

    land("b1.json", Seq((1L, "purchase", 1.0), (2L, "noise", 9.0),
      (3L, "view", 3.0)))
    run()
    val first = spark.read.parquet(out)
    assert(first.count() == 2) // noise filtered

    // the query is down; two more files land (one re-using old ids to
    // prove dedup is by FILE tracking, not content)
    land("b2.json", Seq((4L, "purchase", 4.0)))
    land("b3.json", Seq((1L, "purchase", 1.0)))
    run()
    val all = spark.read.parquet(out)
    assert(all.count() == 4) // +2: b1 NOT reprocessed, b2+b3 exactly once
    assert(all.filter(col("event_id") === 1L).count() == 2) // content dup kept
    assert(all.filter(col("value_2x") === 8.0).count() == 1)

    // a third restart with nothing new lands nothing new
    run()
    assert(spark.read.parquet(out).count() == 4)
  }
}
