package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** A media item: opaque binary payload + typed metadata. At 100 TB the
  * payload column dominates storage; everything that doesn't need bytes
  * (filtering, routing, joins on metadata) must be expressible without
  * deserializing it — hence payload is a plain `binary` column that
  * columnar parquet scans can skip entirely.
  */
final case class MediaItem(
    media_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    width: Int, // pixels (image/video) or 0
    height: Int,
    sample_rate: Int, // Hz (audio) or 0
    n_frames: Int) // video frames / audio windows

/** Decoded per-item features (the batch-UDF output contract). */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    feature: Array[Float]) // fixed FeatureDim-length embedding

/** Multimodal column plumbing: decode / feature-extract / resize /
  * frame-sample over binary payload columns.
  *
  * The container ships no image/audio codecs, so the *decode* step is a
  * [[MediaCodec]] trait with a deterministic fake implementation
  * ([[ByteStatsCodec]]) — the Spark-side plumbing (schema, batch shape,
  * partitioning, executor-side iteration) is real and is what these
  * operators test. A production deployment swaps in a JNI/FFI codec with
  * the same trait, nothing else changes.
  *
  * Batch shape: `mapPartitions` hands each executor thread an iterator over
  * its partition; the codec amortizes per-batch init (model load, codec
  * context) across the partition — same shape as an Arrow/pandas batch UDF,
  * without a Python round-trip.
  */
object Multimodal {

  val FeatureDim = 16

  /** The pluggable decode contract. Implementations must be deterministic
    * per payload for oracle/testing purposes.
    */
  trait MediaCodec extends Serializable {
    /** Called once per partition before items stream through — amortized
      * init (load model weights, allocate codec context).
      */
    def open(): Unit = ()
    def features(payload: Array[Byte]): Array[Float]
    /** "Resize": produce a payload whose decoded dimensions are (w, h). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Sample every `stride`-th frame; a frame is `frameBytes` long. */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]]
  }

  /** Deterministic stand-in codec: features = L1-normalized 16-bin byte
    * histogram; resize = crop/zero-pad to w·h bytes; frames = fixed-size
    * chunks. Replace with a real decoder in production:
    * `class JpegCodec extends MediaCodec { ... }` backed by native libs.
    */
  object ByteStatsCodec extends MediaCodec {
    def features(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) / FeatureDim) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      bins.map(_ / n)
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, w * h)
    def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }
        .toSeq
  }

  /** A real codec would live here; the container has no media libraries,
    * so any attempt to use it fails loudly rather than silently faking.
    */
  object NativeCodec extends MediaCodec {
    def features(payload: Array[Byte]): Array[Float] =
      ??? // STUB: bind a real decoder (libjpeg/ffmpeg) via JNI/FFI
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = ???
    def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = ???
  }

  /** Derive a deterministic media table from `documents`: payload = UTF-8
    * bytes of the text, media_type round-robins by id, metadata synthesized
    * from length. (The corpus ships no binary table; this keeps every byte
    * reproducible on both engines.)
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"),
      (col("n_chars") / 100).cast("int").as("n_frames"))

  /** The batch feature-extraction operator: distributed decode via
    * mapPartitions with per-partition codec init. Returns a typed Dataset —
    * downstream ANN/dedup operators consume `feature` directly.
    */
  def extractFeatures(
      media: DataFrame,
      codec: MediaCodec = ByteStatsCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        it.map { case (id, tpe, payload) =>
          MediaFeatures(id, tpe, payload.length.toLong, codec.features(payload))
        }
      }
  }

  /** Metadata-only query — provably never touches payload bytes except the
    * hash/length (and the scan prunes payload for the pure-metadata
    * aggregations). Oracle-checked: DuckDB 1.0 lacks md5(BLOB), so the
    * oracle hashes the source text — byte-identical to hashing the UTF-8
    * payload, which is the point.
    */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(
        col("media_id"),
        col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_frames").cast("long").as("n_frames"))
      .orderBy(col("media_id"))

  /** Batch decode through the fake codec, aggregated per media_type so the
    * result is compact; rows-only oracle (mapPartitions closure is not
    * SQL-expressible — correctness is pinned by MultimodalSpec instead).
    */
  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(s, dir))
    feats.toDF()
      .select(col("media_type"), col("n_bytes"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("media_type"))
  }

  /** Frame geometry for [[qMultimodalFrames]] (the fake codec's "video"
    * is the payload chopped into fixed-size chunks).
    */
  val FrameBytes = 32
  val FrameStride = 4

  /** One sampled frame of one media item. */
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** The frame-sampling operator: every `stride`-th frame of each video
    * payload, decoded executor-side through the codec (same mapPartitions
    * batch shape as [[extractFeatures]]). Downstream consumers (frame-level
    * feature extraction, frame dedup) read the typed Dataset directly.
    */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = FrameBytes,
      stride: Int = FrameStride,
      codec: MediaCodec = ByteStatsCodec): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        it.flatMap { case (id, payload) =>
          codec.sampleFrames(payload, frameBytes, stride).zipWithIndex
            .map { case (f, i) => MediaFrame(id, i, f) }
        }
      }
  }

  /** Frame-sample report per video: how many frames survive the stride and
    * the fingerprint of the first sampled frame. Oracle-checked because the
    * fake codec's frames are byte ranges of the payload, which DuckDB can
    * reproduce with substr arithmetic — so the mapPartitions plumbing
    * (executor-side codec, explode shape, typed rows) is verified
    * end-to-end against SQL, not just spec-tested.
    */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(s, dir)).toDF()
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_sampled"),
        first(when(col("frame_idx") === 0, md5(col("frame"))), ignoreNulls = true)
          .as("first_frame_md5"))
      .orderBy(col("media_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_multimodal_frames" -> qMultimodalFrames
  )

  def oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  CAST(n_chars % 640 AS BIGINT) AS width,
        |  CAST(n_chars % 480 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate,
        |  CAST(n_chars // 100 AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_features" ->
      """SELECT ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
        |  count(*) AS n_items,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin,
    // Cross-engine contract caveats (DuckDB 1.0 has no BLOB substr/md5,
    // so a byte-faithful oracle is not expressible): (1) substr(text,...)
    // slices CHARACTERS while Spark md5s the first FrameBytes BYTES of
    // the UTF-8 payload — identical only while the corpus text is ASCII
    // in the first frame (true for the synthetic corpus; a multi-byte
    // char inside the first FrameBytes would diverge). (2) WHERE n > 0
    // mirrors Spark's empty-group behavior: a zero-byte payload yields
    // no frames, hence no groupBy row — without the guard the oracle
    // would emit an n_sampled=0 row Spark never produces.
    "q_multimodal_frames" ->
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, text,
         |    octet_length(encode(text)) AS n
         |  FROM documents WHERE doc_id % 3 = 2)
         |SELECT media_id,
         |  CAST(((n + ${FrameBytes - 1}) // $FrameBytes - 1) // $FrameStride + 1
         |    AS BIGINT) AS n_sampled,
         |  md5(substr(text, 1, $FrameBytes)) AS first_frame_md5
         |FROM v WHERE n > 0 ORDER BY media_id""".stripMargin
  )
}
