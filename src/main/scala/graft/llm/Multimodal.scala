package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11 L4): media payloads as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but everything Spark-side is real:
  * the binary column representation, the typed metadata schema, the
  * partition-preserving `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`), and the columnar metadata ops (byte length, content
  * hash) that run without ever decoding.
  *
  * At 100 TB: media bytes never shuffle — decode/feature-extract is a
  * narrow per-partition map; only the (small) extracted features flow into
  * joins/aggregations.
  */
object Multimodal {

  /** Extracted per-media features. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int)

  /** Attach a binary media payload column (here: the utf-8 bytes of `text`
    * stand in for an image payload — the engine only ever sees `binary`).
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** STUB decode kernel — a real build would call an image codec here.
    * Deterministic fake dimensions derived from the payload bytes so tests
    * are stable. Signature + batch shape (iterator-to-iterator per
    * partition, no materialization of the whole partition) are the real
    * contract.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    // ??? <- real codec call goes here (e.g. ImageIO/libjpeg binding)
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    MediaFeatures(id, bytes.length.toLong,
      width = 64 + (bytes.length % 512), height = 64 + (b0 * 4), channels = 3)
  }

  /** Decode/feature-extract pass: narrow, partition-preserving, streaming
    * per partition (the Spark-idiomatic shape for any media kernel).
    */
  def decodeFeatures(spark: SparkSession, withMedia: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Resize metadata (STUB kernel: real build calls the codec here; the
    * deterministic fake keeps aspect-ratio math and byte accounting real).
    */
  case class ResizedMeta(doc_id: Long, orig_bytes: Long, width: Int,
      height: Int, target_w: Int, target_h: Int, scaled_bytes: Long)

  /** Per-frame sample of a (fake) video payload: one output row per sampled
    * frame — the 1→N generator shape every frame-level pipeline needs.
    */
  case class FrameMeta(doc_id: Long, frame_idx: Int, byte_offset: Long)

  /** Resize pass: narrow, partition-preserving, composes after decode. */
  def resizeFeatures(spark: SparkSession, withMedia: DataFrame,
      targetW: Int): Dataset[ResizedMeta] = {
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = decodeStub(id, bytes)
        // ??? <- real scaler goes here; fake preserves aspect ratio exactly
        val targetH = math.max(1, (f.height.toLong * targetW / f.width).toInt)
        ResizedMeta(id, bytes.length.toLong, f.width, f.height,
          targetW, targetH,
          bytes.length.toLong * targetW * targetH / (f.width.toLong * f.height))
      })
  }

  /** Frame sampling: every `stride`-th "frame" (here: 256-byte windows of
    * the payload stand in for frames). Iterator-to-iterator flatMap — no
    * partition materialization, 1 input row → N output rows.
    */
  def sampleFrames(spark: SparkSession, withMedia: DataFrame,
      stride: Int): Dataset[FrameMeta] = {
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        // ??? <- real demuxer goes here (frame boundaries from container)
        val nFrames = math.max(1, bytes.length / 256)
        (0 until nFrames by stride).iterator
          .map(i => FrameMeta(id, i, i.toLong * 256))
      })
  }

  val all: Seq[Q] = Seq(

    // ---- L4: columnar metadata over binary payloads (no decode needed) --------
    Q("q_multimodal_meta", Some(
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => withBinaryPayload(Tables(s, d, "documents"))
        .select(col("doc_id"),
          length(col("media")).cast("long").as("n_bytes"),
          sha2(col("media"), 256).as("sha"))
        .orderBy("doc_id")),

    // ---- L4: resize + frame-sample kernels (rows-only checks) ------------------
    Q("q_multimodal_resize", None,
      (s, d) => resizeFeatures(s,
        withBinaryPayload(Tables(s, d, "documents")), targetW = 224)
        .toDF()
        .select("doc_id", "width", "height", "target_w", "target_h",
          "scaled_bytes")
        .orderBy("doc_id")),

    Q("q_multimodal_frames", None,
      (s, d) => sampleFrames(s,
        withBinaryPayload(Tables(s, d, "documents").filter(col("doc_id") < 100)),
        stride = 2)
        .toDF()
        .orderBy("doc_id", "frame_idx")),

    // ---- L4: stubbed decode + feature aggregation (rows-only check) ------------
    Q("q_multimodal_decode", None,
      (s, d) => {
        val feats = decodeFeatures(s, withBinaryPayload(Tables(s, d, "documents")))
        feats.toDF()
          .groupBy("channels")
          .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
            max("width").as("max_width"), max("height").as("max_height"))
          .orderBy("channels")
      })
  )
}
