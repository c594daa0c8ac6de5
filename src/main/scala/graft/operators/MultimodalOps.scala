package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * batch "decode"/feature-extract over partitions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (see [[MultimodalOps.stubDecode]]) —
  * but the Spark-side shape is real: binary column in, typed struct of
  * metadata out, decoder state initialized once per partition (the
  * mapPartitions pattern you'd use for a JNI codec or an ONNX session,
  * mirroring the reference's per-batch decoder reuse, indexer.js:6999).
  */
object MultimodalOps {

  // M1 — binary metadata: treat text payloads as opaque bytes; byte
  // length + content digest per blob, aggregated per source.
  private def m1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        countDistinct(col("sha")).as("n_unique"),
        min(col("sha")).as("min_sha"))
      .orderBy(col("source"))

  private val m1Sql =
    s"""SELECT source, count(*) AS n_blobs,
       | ${sqlLsum("octet_length(CAST(text AS BLOB))")} AS total_bytes,
       | count(DISTINCT sha256(text)) AS n_unique,
       | min(sha256(text)) AS min_sha
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Decoded-media metadata row produced by the stub decoder. */
  case class MediaMeta(doc_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, feat0: Double)

  /** STUB decoder: derives fake-but-deterministic "media" properties from
    * the payload digest. A real deployment swaps `decodeOne` for a codec
    * call; everything around it (per-partition init, batch iteration,
    * typed output schema) is the production shape. */
  def stubDecode(payload: Array[Byte], digest: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? real codec goes here; deterministic fake derived from digest:
    val w = 16 + (digest(0) & 0x3f) * 16
    val h = 16 + (digest(1) & 0x3f) * 16
    val f = 1 + (digest(2) & 0x0f)
    val feat = ((digest(3) & 0xff) << 8 | (digest(4) & 0xff)).toDouble / 65535.0
    (w, h, f, feat)
  }

  // M2 — partitioned decode/feature-extract (rows-only check; the stub's
  // outputs are engine-specific by construction).
  private def m2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      // filter BEFORE the typed mapPartitions barrier: Catalyst can't
      // push predicates through it, and the decode step is the expensive
      // part being gated
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
    src.mapPartitions { it =>
      // per-partition decoder init (codec/session handle goes here)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { case (id, source, payload) =>
        md.reset()
        val digest = md.digest(payload)
        val (w, h, f, feat) = stubDecode(payload, digest)
        MediaMeta(id, source, payload.length, w, h, f, feat)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  // M3 — frame sampling: the video-frame selection a multimodal
  // pipeline runs before feature extraction, as a pure Spark projection
  // + explode. "Frame count" derives deterministically from the content
  // digest (both engines compute the same sha-256 hex), so unlike the
  // decode stub this one has a full cross-engine oracle: pick every
  // ceil(n/4)-th frame of n.
  private def m3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .withColumn("sha", sha2(col("text").cast("binary"), 256))
      .withColumn("n_frames", (ascii(col("sha")) % 16 + 1).cast("int"))
      .withColumn("step",
        ceil(col("n_frames") / lit(4.0)).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1, col("step")))
          .as(Seq("sample_idx", "frame")))
      .select(col("doc_id"), col("n_frames"), col("sample_idx"),
        col("frame"))
      .orderBy(col("doc_id"), col("sample_idx"))

  private val m3Sql =
    """SELECT doc_id, n_frames,
      | CAST(unnest(generate_series(0, len(fr) - 1)) AS INT) AS sample_idx,
      | CAST(unnest(fr) AS INT) AS frame
      |FROM (SELECT doc_id, n_frames,
      |  range(0, n_frames, CAST(ceil(n_frames / 4.0) AS INT)) AS fr
      | FROM (SELECT doc_id,
      |   CAST(ascii(sha256(text)) % 16 + 1 AS INT) AS n_frames
      |  FROM documents WHERE doc_id < 200))
      |ORDER BY doc_id, sample_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1 _),
    "m2_media_decode_stub" -> (m2 _),
    "m3_frame_sample" -> (m3 _),
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m3_frame_sample" -> m3Sql,
  )
}
