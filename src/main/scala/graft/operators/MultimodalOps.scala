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

  /** Parsed audio metadata row (nulls = quarantine route). */
  case class AudioMeta(doc_id: Long, source: String,
      sample_rate: Option[Int], channels: Option[Int],
      duration_sec: Option[Double])

  /** Deterministic WAV payload for `doc_id`: a REAL RIFF/WAVE header
    * (fmt + data chunks, header-only — the data SIZE field is what
    * corpus metadata needs, not the samples) with rate 8k/16k/44.1k by
    * doc_id%3, 1-2 channels, 16-bit; every 5th doc is garbage the
    * parser must quarantine. */
  def synthWav(docId: Long): Array[Byte] = {
    if (docId % 5 == 0) return ("NOTAUDIO" + docId).getBytes
    val rate = Seq(8000, 16000, 44100)((docId % 3).toInt)
    val ch = 1 + (docId % 2).toInt
    val nSamples = (docId % 1000).toInt * 10 + 100
    val dataBytes = nSamples * ch * 2
    def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    "RIFF".getBytes ++ u32le(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ u32le(16) ++ u16le(1) ++ u16le(ch) ++
      u32le(rate) ++ u32le(rate * ch * 2) ++ u16le(ch * 2) ++ u16le(16) ++
      "data".getBytes ++ u32le(dataBytes)
  }

  // M5 — audio header decode + per-source duration budget: the same
  // mapPartitions decode shape as m2 over WAV headers, rolled up to
  // corpus-curation numbers (parse rate, total seconds, rate mix).
  // Duration per row is ONE double division both engines evaluate
  // identically; the sum rides exact decimals.
  private def m5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), col("source")).as[(Long, String)]
    src.mapPartitions { it =>
      it.map { case (id, source) =>
        val info = graft.functions.MediaHeader.parseWav(synthWav(id))
        AudioMeta(id, source, info.map(_.sampleRate),
          info.map(_.channels), info.map(_.durationSec))
      }
    }.toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        count(col("sample_rate")).as("n_audio"),
        decOut(sum(dec12(col("duration_sec")))).as("total_seconds"),
        countDistinct(col("sample_rate")).as("n_rates"),
        sum(col("channels").cast("long")).as("total_channels"))
      .orderBy(col("source"))
  }

  private val m5Sql =
    s"""WITH wav AS (SELECT doc_id, source,
       |  CASE WHEN doc_id % 5 = 0 THEN NULL
       |   ELSE CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |    ELSE 44100 END END AS sample_rate,
       |  CASE WHEN doc_id % 5 = 0 THEN NULL
       |   ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
       |  (doc_id % 1000) * 10 + 100 AS n_samples
       | FROM documents WHERE doc_id < 500),
       |dur AS (SELECT *,
       |  CASE WHEN sample_rate IS NULL THEN NULL
       |   ELSE CAST(n_samples * channels * 2 AS DOUBLE) /
       |    (sample_rate * channels * 2) END AS duration_sec
       | FROM wav)
       |SELECT source, count(*) AS n_blobs,
       | count(sample_rate) AS n_audio,
       | ${sqlDecOut("sum(CAST(duration_sec AS DECIMAL(38,12)))")}
       |   AS total_seconds,
       | count(DISTINCT sample_rate) AS n_rates,
       | ${sqlLsum("channels")} AS total_channels
       |FROM dur GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic MP4 payload for `doc_id`: real ISO-BMFF boxes —
    * ftyp, then moov{mvhd(timescale 1000, duration), trak{tkhd(16.16
    * fixed-point dimensions)}} — header-only, no mdat; every 4th doc
    * is garbage. */
  def synthMp4(docId: Long): Array[Byte] = {
    if (docId % 4 == 3) return ("NOTVIDEO" + docId).getBytes
    val w = (1 + docId % 1920).toInt
    val h = (1 + (docId * 3) % 1080).toInt
    val durMs = (docId % 3600).toInt * 1000 + 500
    def u32be(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = u32be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ u32be(0)
    val mvhd = u32be(28) ++ "mvhd".getBytes ++ u32be(0) ++ // ver/flags
      u32be(0) ++ u32be(0) ++ // ctime mtime
      u32be(1000) ++ u32be(durMs) // timescale, duration
    val tkhdPayload = u32be(0) ++ u32be(0) ++ u32be(0) ++ u32be(1) ++
      u32be(0) ++ u32be(durMs) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](8)(0) ++ // layer/alt/vol/reserved
      Array.fill[Byte](36)(0) ++ // identity matrix slot
      u32be(w << 16) ++ u32be(h << 16)
    val tkhd = u32be(8 + tkhdPayload.length) ++ "tkhd".getBytes ++
      tkhdPayload
    val trak = u32be(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
    val moov = u32be(8 + mvhd.length + trak.length) ++ "moov".getBytes ++
      mvhd ++ trak
    ftyp ++ moov
  }

  /** Parsed video metadata row. */
  case class VideoMeta(doc_id: Long, format: Option[String],
      width: Option[Int], height: Option[Int],
      duration_ms: Option[Long])

  // M6 — video container decode (box walk): per-doc parsed dims +
  // duration; oracle recomputes the synth arithmetic. A wrong box
  // offset or fixed-point shift hash-mismatches every row.
  private def m6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
    src.mapPartitions { it =>
      it.map { id =>
        val info = graft.functions.MediaHeader.parseMp4(synthMp4(id))
        VideoMeta(id, info.map(_.format), info.map(_.width),
          info.map(_.height), info.map(_.durationMs))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  private val m6Sql =
    """SELECT doc_id,
      | CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 'mp4' END AS format,
      | CASE WHEN doc_id % 4 = 3 THEN NULL
      |  ELSE CAST(1 + doc_id % 1920 AS INT) END AS width,
      | CASE WHEN doc_id % 4 = 3 THEN NULL
      |  ELSE CAST(1 + (doc_id * 3) % 1080 AS INT) END AS height,
      | CASE WHEN doc_id % 4 = 3 THEN NULL
      |  ELSE (doc_id % 3600) * 1000 + 500 END AS duration_ms
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1 _),
    "m2_media_decode" -> (m2 _),
    "m3_frame_sample" -> (m3 _),
    "m4_patch_grid" -> (m4 _),
    "m5_audio_meta" -> (m5 _),
    "m6_video_meta" -> (m6 _),
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m2_media_decode" -> m2Sql,
    "m3_frame_sample" -> m3Sql,
    "m4_patch_grid" -> m4Sql,
    "m5_audio_meta" -> m5Sql,
    "m6_video_meta" -> m6Sql,
  )
}
