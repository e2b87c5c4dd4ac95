package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batch-wise per partition.
  *
  * The Spark-side plumbing (schema, batch shape, partition-parallel
  * execution, metadata propagation) is real, and so is the *header*
  * decode: [[imageMeta]] parses PNG/BMP/GIF/JPEG container bytes to
  * format/dimensions/bit-depth/channels natively
  * ([[graft.functions.ImageCodec]]). Only decompressing pixel/sample
  * data remains a STUB — this container has no image/audio
  * libraries, so [[fakeDecode]] derives a deterministic feature
  * vector from the bytes. Swapping in a full decoder means replacing
  * only the per-batch function, exactly where a
  * Pandas-UDF/`mapInPandas` decode body would go.
  */
object BinaryPipeline {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Wrap a text table into a multimodal-shaped table: payload bytes +
    * metadata struct. At scale the payload column lives in parquet as
    * BINARY and column pruning keeps it unread unless requested.
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        length(col("text")).as("n_chars")).as("meta"))

  /** STUB decoder: a real implementation would decode image/audio
    * bytes here. The fake is deterministic: 4 "features" derived from
    * byte statistics (delegates to the native expression's kernel so
    * the spec and the query path share one definition).
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] =
    graft.functions.ByteStats.decode(payload)

  /** STUB resize: a real implementation decodes, scales, and
    * re-encodes; the fake deterministically truncates/pads the
    * payload to `targetBytes` so the schema/plumbing (binary in,
    * binary out, metadata updated in place) is real and testable.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload",
      substring(concat(col("payload"), lit(Array.fill[Byte](1)(0))), 1, targetBytes))

  /** STUB frame sampling: a real implementation picks every Nth video
    * frame; the fake slices the payload into `frames` equal chunks —
    * one output row per sampled "frame", the exact explode shape a
    * frame sampler produces.
    */
  def frameSample(media: DataFrame, frames: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame",
        substring(col("payload"),
          (col("frame_idx") * (length(col("payload")) / frames) + 1).cast("int"),
          (length(col("payload")) / frames).cast("int")))
      .select(col("doc_id"), col("frame_idx"), col("frame"), col("meta"))

  /** Real image-header decode over the payload column: a struct of
    * (format, width, height, bit_depth, channels) parsed from the
    * container bytes, null for payloads that aren't recognized
    * images. One codegen'd projection — the 100 TB path is a straight
    * scan of the payload column with everything else pruned.
    */
  def imageMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      graft.functions.ImageFunctions.imageMeta(col("payload")).as("image"))

  /** Feature extraction over the payload column — a single projection
    * through the native [[graft.functions.ByteStats]] expression, so
    * the "decode" stays inside whole-stage codegen and the scan prunes
    * to exactly (doc_id, meta.mime, payload). No RDD hop, no driver
    * loop; swapping in a real decoder means swapping the expression
    * for an arrow-batched UDF at this same call site.
    */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.mime").as("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      graft.functions.BinaryFunctions.byteStats(col("payload")).as("features"))

  /** Exact binary dedup by content digest — the modality-blind first
    * pass of any multimodal dedup (identical bytes are identical
    * media regardless of what decodes them): md5 the payload in the
    * scan projection (so only the 32-hex digest crosses the shuffle,
    * never the payload), group, keep the lowest id per content. Only
    * duplicated contents are reported; the 16-byte digest makes
    * collisions ignorable at any corpus size.
    */
  def binaryDedup(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), md5(col("payload")).as("content_hash"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keep_id"),
        min(col("n_bytes")).as("n_bytes"))
      .filter(col("n_copies") >= 2)
}
