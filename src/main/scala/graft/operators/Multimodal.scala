package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode/feature-extract stage.
  *
  * The media table is derived deterministically from `documents` (payload =
  * UTF-8 bytes of the text — the container has no media codecs, so bytes
  * stand in for encoded frames; all driver text is pure ASCII, so the
  * byte↔char correspondence keeps the DuckDB oracle exact).
  *
  * Two execution paths:
  *  - `decodeStats` — expression-only feature extraction over the binary
  *    column (byte length, header bytes, md5 checksum): stays inside
  *    whole-stage codegen, fully oracle-checked;
  *  - `decodeFeatures` — the real decode plumbing: a typed
  *    `Dataset[MediaRecord].mapPartitions` with a pluggable `MediaDecoder`
  *    (per-partition init → streamed batch decode — the JVM shape of
  *    `mapInPandas`). The bundled decoder is a clearly-marked deterministic
  *    FAKE (no codec libs in the container); swap `FakeDecoder` for a real
  *    JNI/FFI decoder at deploy time without touching the plan.
  */
object Multimodal {

  /** One media object: opaque encoded payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,       // image | audio | video
      payload: Array[Byte],     // opaque encoded bytes
      width: Option[Int],       // image/video
      height: Option[Int],      // image/video
      sample_rate: Option[Int], // audio
      n_frames: Option[Int])    // video

  /** Decoded features — what a real decoder would emit per object. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      mean_byte: Double,        // "loudness"/brightness proxy
      frame_checksums: Seq[Long]) // per-sampled-frame rolling hashes

  /** Decoder contract: created once per partition (expensive native init
    * happens here, NOT per record), then streamed over the iterator. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Deterministic fake decoder — stands in for the codec libraries this
    * container lacks. Real byte math over the payload (so the plumbing is
    * genuinely exercised), no external deps. */
  object FakeDecoder extends MediaDecoder {
    val FrameSize = 16
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.payload
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
      val checksums = bytes.grouped(FrameSize).take(4).map { frame =>
        frame.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      }.toSeq
      MediaFeatures(r.media_id, r.media_type, bytes.length.toLong, mean, checksums)
    }
  }

  /** Media table: documents dressed as media objects. Metadata is
    * mod-arithmetic over doc_id (deterministic, oracle-replicable). */
  def media(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3L).cast("int") + 1).as("media_type"),
        col("text").cast("binary").as("payload"),
        when(col("doc_id") % 3L =!= 1L, (col("doc_id") % 1920L + 1L).cast("int")).as("width"),
        when(col("doc_id") % 3L =!= 1L, (col("doc_id") % 1080L + 1L).cast("int")).as("height"),
        when(col("doc_id") % 3L === 1L,
          element_at(typedLit(Seq(16000, 44100, 48000)),
            // index from a DIFFERENT modulus than the audio guard, so all
            // three rates actually occur; (doc_id-1)/3 is exact integer
            // division here (doc_id % 3 == 1)
            (((col("doc_id") - 1L) / 3.0).cast("long") % 3L).cast("int") + 1)).as("sample_rate"),
        when(col("doc_id") % 3L === 2L, (col("doc_id") % 300L + 1L).cast("int")).as("n_frames"))
      .as[MediaRecord]
  }

  /** Expression-only decode stats over the binary payload — codegen'd,
    * no shuffle, oracle-checked. */
  def decodeStats(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).toDF()
      .select(col("media_id"), col("media_type"),
        col("width"), col("height"), col("sample_rate"), col("n_frames"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        hex(substring(col("payload"), 1, 8)).as("header_hex"),
        md5(col("payload")).as("checksum"))
      .orderBy(col("media_id"))

  /** All payload bytes are ASCII text bytes, so the oracle computes the
    * identical values from the text column. */
  val decodeStatsOracle: String =
    """SELECT doc_id AS media_id,
      |       CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |       CASE WHEN doc_id % 3 <> 1 THEN (doc_id % 1920 + 1)::INT END AS width,
      |       CASE WHEN doc_id % 3 <> 1 THEN (doc_id % 1080 + 1)::INT END AS height,
      |       CASE WHEN doc_id % 3 = 1 THEN
      |         (CASE ((doc_id - 1) // 3 % 3) WHEN 0 THEN 16000 WHEN 1 THEN 44100 ELSE 48000 END)::INT END AS sample_rate,
      |       CASE WHEN doc_id % 3 = 2 THEN (doc_id % 300 + 1)::INT END AS n_frames,
      |       length(text)::BIGINT AS byte_len,
      |       upper(hex(encode(substring(text, 1, 8)))) AS header_hex,
      |       md5(text) AS checksum
      |FROM documents ORDER BY media_id""".stripMargin

  /** Frame size in bytes for the expression-level frame addressing. */
  val FrameBytes = 16

  /** Evenly-spaced frame sampling over VIDEO payloads, as pure expressions:
    * the payload is addressed as `FrameBytes`-wide frames, up to 4 frames
    * are picked at stride max(1, n_frames/4), and each sampled frame's
    * bytes are surfaced as hex. This is the Spark-side plumbing of a
    * frame-sampler (offset math, stride selection, per-frame slicing,
    * explode to one row per frame) — a real codec replaces the byte slice,
    * not the plan. Narrow map-only stage: Generate (posexplode) but no
    * shuffle before the final order. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val m = media(spark, dir).toDF().filter(col("media_type") === "video")
    // `div`, not `/`: Column./ is fractional; frame math must stay integral.
    val nchunks = expr(s"(octet_length(payload) + ${FrameBytes - 1}) div $FrameBytes")
      .cast("long").as("nchunks")
    val withN = m.select(col("media_id"), col("payload"), nchunks)
    val stride = greatest(expr("nchunks div 4").cast("long"), lit(1L))
    val idxs = filter(transform(sequence(lit(0L), lit(3L)), s => s * stride),
      i => i < col("nchunks"))
    withN.select(col("media_id"), col("payload"), explode(idxs).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        hex(col("payload").substr(col("frame_idx") * FrameBytes + 1L, lit(FrameBytes)))
          .as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Payload bytes are the ASCII text bytes, so frame slices are text
    * substrings on the oracle side. */
  val frameSampleOracle: String =
    s"""WITH v AS (SELECT doc_id AS media_id, text,
       |                  (length(text) + ${FrameBytes - 1}) // $FrameBytes AS nchunks
       |           FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT media_id, text,
       |             unnest(list_filter(list_transform(range(0, 4),
       |                    s -> s * greatest(nchunks // 4, 1)), i -> i < nchunks)) AS frame_idx
       |      FROM v)
       |SELECT media_id, frame_idx,
       |       upper(hex(encode(substring(text, (frame_idx * $FrameBytes + 1)::INT, $FrameBytes)))) AS frame_hex
       |FROM f
       |ORDER BY media_id, frame_idx""".stripMargin

  /** Cross-video duplicate-frame detection — the dedup family applied to
    * the multimodal column (the standard intro-card / black-frame screen
    * of video pipelines): exact dedup on sampled frame CONTENT. One hash
    * aggregate keyed by the frame bytes over the [[frameSample]]
    * relation; groups of ≥ 2 surface with their canonical (min media,
    * min frame) occurrence — the dedup_exact shape, so at 100 TB this is
    * one map-side-combinable exchange on the frame key, never a pairwise
    * join. A real codec would key on a perceptual hash instead of raw
    * bytes; the plan is identical (the MediaDecoder boundary note). */
  def frameDedup(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir)
      .groupBy(col("frame_hex"))
      .agg(count(lit(1)).as("n_dups"),
        min(struct(col("media_id"), col("frame_idx"))).as("c"))
      .filter(col("n_dups") >= 2)
      .select(col("frame_hex"), col("n_dups"),
        col("c.media_id").as("canonical_media_id"),
        col("c.frame_idx").as("canonical_frame_idx"))
      .orderBy(col("frame_hex"))

  /** Composes the frame-sample oracle as a subquery (the lmCutOracle
    * pattern) — the frame addressing is spelled exactly once. */
  val frameDedupOracle: String =
    s"""WITH s AS (SELECT media_id, frame_idx, frame_hex
       |           FROM (${frameSampleOracle})),
       |g AS (SELECT frame_hex, media_id, frame_idx,
       |        count(*) OVER (PARTITION BY frame_hex) AS n_dups,
       |        row_number() OVER (PARTITION BY frame_hex
       |                           ORDER BY media_id, frame_idx) AS rn
       |      FROM s)
       |SELECT frame_hex, n_dups::BIGINT AS n_dups,
       |       media_id AS canonical_media_id, frame_idx AS canonical_frame_idx
       |FROM g WHERE rn = 1 AND n_dups >= 2
       |ORDER BY frame_hex""".stripMargin

  /** Resize target box (longest side). */
  val ResizeBox = 64
  /** Bytes in the strided resample signature. */
  val ResizeSigBytes = 16

  /** Aspect-preserving resize plumbing over IMAGE payloads, as pure
    * expressions: integer scale factor so the longest side fits
    * `ResizeBox`, output dims, and a strided byte resample of the payload
    * (every len/16-th byte, hex-joined) standing in for nearest-neighbor
    * pixel resampling — a real codec replaces the byte sampling, not the
    * dim math or the plan. Map-only, no shuffle before the final order. */
  def resizeStats(spark: SparkSession, dir: String): DataFrame = {
    val m = media(spark, dir).toDF().filter(col("media_type") === "image")
    val scale = greatest(
      expr(s"(greatest(width, height) + ${ResizeBox - 1}) div $ResizeBox").cast("long"),
      lit(1L))
    val len = octet_length(col("payload")).cast("long")
    val stride = greatest(expr(s"octet_length(payload) div $ResizeSigBytes").cast("long"), lit(1L))
    val positions = filter(
      transform(sequence(lit(0L), lit(ResizeSigBytes - 1L)), i => i * stride + 1L),
      p => p <= len)
    val sig = array_join(transform(positions, p => hex(col("payload").substr(p, lit(1)))), "")
    // One projection over one scan — dims and signature together (a join
    // back to m for the sig would scan the subset twice for nothing).
    m.withColumn("scale", scale)
      .select(col("media_id"), col("width"), col("height"),
        greatest(expr("width div scale").cast("long"), lit(1L)).as("out_width"),
        greatest(expr("height div scale").cast("long"), lit(1L)).as("out_height"),
        sig.as("resample_sig"))
      .orderBy(col("media_id"))
  }

  val resizeStatsOracle: String =
    s"""WITH img AS (SELECT doc_id AS media_id,
       |                    (doc_id % 1920 + 1)::BIGINT AS width,
       |                    (doc_id % 1080 + 1)::BIGINT AS height,
       |                    text, length(text)::BIGINT AS len
       |             FROM documents WHERE doc_id % 3 = 0),
       |s AS (SELECT *, greatest((greatest(width, height) + ${ResizeBox - 1}) // $ResizeBox, 1) AS scale,
       |             greatest(len // $ResizeSigBytes, 1) AS stride
       |      FROM img)
       |SELECT media_id, width::INT AS width, height::INT AS height,
       |       greatest(width // scale, 1) AS out_width,
       |       greatest(height // scale, 1) AS out_height,
       |       list_aggregate(list_transform(
       |         list_filter(list_transform(range(0, $ResizeSigBytes), i -> i * stride + 1), p -> p <= len),
       |         p -> upper(hex(encode(substring(text, p::INT, 1))))), 'string_agg', '') AS resample_sig
       |FROM s
       |ORDER BY media_id""".stripMargin

  /** Target sample rate for the audio resample plumbing. */
  val AudioTargetRate = 16000

  /** PCM-downsample plumbing over AUDIO payloads (completing the
    * image/audio/video operator triple): the payload is addressed as 8-bit
    * mono samples, the integer decimation stride brings the rate at or
    * under `AudioTargetRate` (44100→22050, 48000→16000, 16000 passes
    * through), and the decimated stream's duration plus a strided byte
    * signature stand in for the real resampler — a codec replaces the byte
    * picks, not the stride math or the plan. Map-only, no shuffle before
    * the final order. */
  def audioResample(spark: SparkSession, dir: String): DataFrame = {
    val a = media(spark, dir).toDF().filter(col("media_type") === "audio")
    val len = octet_length(col("payload")).cast("long")
    val stride = greatest(
      expr(s"sample_rate div $AudioTargetRate").cast("long"), lit(1L))
    val positions = filter(
      transform(sequence(lit(0L), lit(ResizeSigBytes - 1L)),
        i => i * stride * lit(4L) + 1L),
      p => p <= len)
    val sig = array_join(transform(positions, p => hex(col("payload").substr(p, lit(1)))), "")
    a.withColumn("stride", stride)
      .select(col("media_id"), col("sample_rate"),
        expr("sample_rate div stride").cast("long").as("out_rate"),
        expr(s"(octet_length(payload) + stride - 1) div stride").cast("long").as("n_out"),
        expr("octet_length(payload) * 1000 div sample_rate").cast("long").as("duration_ms"),
        sig.as("resample_sig"))
      .orderBy(col("media_id"))
  }

  val audioResampleOracle: String =
    s"""WITH au AS (SELECT doc_id AS media_id,
       |                   (CASE ((doc_id - 1) // 3 % 3)
       |                    WHEN 0 THEN 16000 WHEN 1 THEN 44100 ELSE 48000 END)::BIGINT AS sample_rate,
       |                   text, length(text)::BIGINT AS len
       |            FROM documents WHERE doc_id % 3 = 1),
       |s AS (SELECT *, greatest(sample_rate // $AudioTargetRate, 1) AS stride FROM au)
       |SELECT media_id, sample_rate::INT AS sample_rate,
       |       (sample_rate // stride)::BIGINT AS out_rate,
       |       ((len + stride - 1) // stride)::BIGINT AS n_out,
       |       (len * 1000 // sample_rate)::BIGINT AS duration_ms,
       |       list_aggregate(list_transform(
       |         list_filter(list_transform(range(0, $ResizeSigBytes), i -> i * stride * 4 + 1), p -> p <= len),
       |         p -> upper(hex(encode(substring(text, p::INT, 1))))), 'string_agg', '') AS resample_sig
       |FROM s
       |ORDER BY media_id""".stripMargin

  /** The typed decode pipeline: per-partition decoder init + streamed
    * decode — the plan a real codec integration uses. Exercised by
    * ScalaTest (the fake decoder has no SQL equivalent by design). */
  def decodeFeatures(spark: SparkSession, dir: String,
                     decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media(spark, dir).mapPartitions { it =>
      // Per-partition init point: a real decoder opens its native context
      // here once, not per record.
      val d = decoder
      it.map(d.decode)
    }
  }
}
