package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * batch decode/feature-extract over partitions.
  *
  * The decode step is a REAL pure-JVM container-header parse
  * ([[graft.functions.MediaHeader]]: PNG IHDR, GIF screen descriptor,
  * JPEG SOF marker scan) — no codec libraries needed for
  * format/width/height, which is what corpus filtering actually keys
  * on. The Spark-side shape is the production one: binary column in,
  * typed struct of metadata out, decoder state initialized once per
  * partition (the mapPartitions pattern you'd use for a JNI pixel
  * codec or an ONNX session, mirroring the reference's per-batch
  * decoder reuse, indexer.js:6999). Payloads are synthesized
  * deterministically from doc_id so the DuckDB twin can recompute the
  * expected parse output arithmetically — a mis-read endianness or
  * offset hash-mismatches.
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

  /** Decoded-media metadata row produced by the header decoder.
    * format/width/height are null for unparseable payloads (the
    * quarantine route). */
  case class MediaMeta(doc_id: Long, source: String, n_bytes: Int,
      format: Option[String], width: Option[Int], height: Option[Int])

  /** Deterministic media payload for `doc_id`: a REAL container header
    * (doc_id % 4 → PNG / GIF89a / JPEG / non-media garbage) carrying
    * width `1 + doc_id % 4093` and height `1 + 7·doc_id % 4093` in the
    * format's own wire encoding — PNG u32 big-endian, GIF u16
    * little-endian, JPEG SOF0 u16 big-endian behind an APP0 segment.
    * Stands in for reading real blobs from an object store; the parse
    * step downstream is the production code path. */
  def synthPayload(docId: Long): Array[Byte] = {
    val w = (1 + docId % 4093).toInt
    val h = (1 + (docId * 7) % 4093).toInt
    def u16be(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32be(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    (docId % 4) match {
      case 0 => // PNG: sig ‖ IHDR(len=13) ‖ w,h BE ‖ depth/color/etc ‖ crc
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
          u32be(13) ++ "IHDR".getBytes ++ u32be(w) ++ u32be(h) ++
          Array[Byte](8, 6, 0, 0, 0) ++ u32be(0)
      case 1 => // GIF89a: screen descriptor, u16 LE
        "GIF89a".getBytes ++
          Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
            (h & 0xff).toByte, ((h >> 8) & 0xff).toByte) ++
          Array[Byte](0, 0, 0)
      case 2 => // JPEG: SOI ‖ APP0(JFIF) ‖ SOF0(precision, H, W, 1 comp)
        Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ u16be(16) ++
          "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
          Array(0xff, 0xc0).map(_.toByte) ++ u16be(11) ++
          Array[Byte](8) ++ u16be(h) ++ u16be(w) ++ Array[Byte](1, 0x11, 0)
      case _ => // not a media container → parser must return None
        "NOTMEDIA".getBytes ++ Array((docId % 256).toByte)
    }
  }

  /** The decoded-metadata frame m2 serves and m4 plans over: synthesize
    * the payload, parse it back through the real header parser. */
  private def decodedMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      // filter BEFORE the typed mapPartitions barrier: Catalyst can't
      // push predicates through it, and the decode step is the expensive
      // part being gated
      .filter(col("doc_id") < 400)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
    src.mapPartitions { it =>
      // per-partition decoder init (a pixel codec/session handle would
      // initialize here; header parsing itself is stateless)
      it.map { case (id, source) =>
        val payload = synthPayload(id)
        val info = graft.functions.MediaHeader.parse(payload)
        MediaMeta(id, source, payload.length, info.map(_.format),
          info.map(_.width), info.map(_.height))
      }
    }.toDF()
  }

  // M2 — partitioned media header decode. Oracle: DuckDB recomputes
  // format/dims/len arithmetically from doc_id.
  private def m2(s: SparkSession, d: String): DataFrame =
    decodedMeta(s, d).orderBy(col("doc_id"))

  private val m2Sql =
    """SELECT doc_id, source,
      | CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 32
      |  ELSE 9 END AS n_bytes,
      | CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |  WHEN 2 THEN 'jpeg' END AS format,
      | CASE WHEN doc_id % 4 < 3
      |  THEN CAST(1 + doc_id % 4093 AS INT) END AS width,
      | CASE WHEN doc_id % 4 < 3
      |  THEN CAST(1 + (doc_id * 7) % 4093 AS INT) END AS height
      |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin

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

  // M4 — ViT patch-grid planning over the DECODED dimensions: every
  // image's 16x16 patch grid (ceil per axis), padding, and visual-token
  // count (patches + CLS) — the sequence-length budgeting a multimodal
  // training pipeline runs before it spends GPU time, rolled up per
  // container format with an over-budget census. Pure integer
  // arithmetic downstream of the m2 decode, so the oracle recomputes
  // the whole plan from doc_id like m2's.
  private val PatchPx = 16
  private val TokenBudget = 4096L
  private def m4(s: SparkSession, d: String): DataFrame =
    decodedMeta(s, d)
      .filter(col("format").isNotNull)
      .withColumn("px", expr(s"CAST((width + ${PatchPx - 1}) div $PatchPx AS BIGINT)"))
      .withColumn("py", expr(s"CAST((height + ${PatchPx - 1}) div $PatchPx AS BIGINT)"))
      .withColumn("tokens", col("px") * col("py") + 1)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_imgs"),
        sum(col("tokens")).as("total_tokens"),
        max(col("tokens")).as("max_tokens"),
        sum(when(col("tokens") > TokenBudget, 1L).otherwise(0L))
          .as("n_over_budget"),
        sum((col("px") * PatchPx - col("width")) +
          (col("py") * PatchPx - col("height"))).as("total_pad_px"))
      .orderBy(col("format"))

  private val m4Sql =
    s"""WITH img AS (SELECT doc_id,
       |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
       |   WHEN 2 THEN 'jpeg' END AS format,
       |  1 + doc_id % 4093 AS w, 1 + (doc_id * 7) % 4093 AS h
       | FROM documents WHERE doc_id < 400 AND doc_id % 4 < 3),
       |grid AS (SELECT format,
       |  (w + ${PatchPx - 1}) // $PatchPx AS px,
       |  (h + ${PatchPx - 1}) // $PatchPx AS py, w, h FROM img)
       |SELECT format, count(*) AS n_imgs,
       | ${sqlLsum("px * py + 1")} AS total_tokens,
       | max(px * py + 1) AS max_tokens,
       | ${sqlLsum(s"CASE WHEN px * py + 1 > $TokenBudget THEN 1 ELSE 0 END")}
       |   AS n_over_budget,
       | ${sqlLsum(s"(px * $PatchPx - w) + (py * $PatchPx - h)")}
       |   AS total_pad_px
       |FROM grid GROUP BY format ORDER BY format""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1 _),
    "m2_media_decode" -> (m2 _),
    "m3_frame_sample" -> (m3 _),
    "m4_patch_grid" -> (m4 _),
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m2_media_decode" -> m2Sql,
    "m3_frame_sample" -> m3Sql,
    "m4_patch_grid" -> m4Sql,
  )
}
