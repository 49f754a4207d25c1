package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): treat media as an
  * opaque `binary` payload + typed metadata, with decode / feature-extract
  * as batch-friendly per-partition transforms.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decode (documented as such): it derives a fixed-size
  * "feature vector" from the payload bytes. The Spark-side plumbing —
  * binary schema, partition-batched processing, feature schema — is real
  * and is what the operator contributes; swap `decodeStub` for a JNI/
  * Pandas-UDF codec in production.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Build a media table from `documents`: payload = UTF-8 bytes of text
    * (the opaque stand-in for image/audio bytes).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 2 === 0, lit("image/png")).otherwise(lit("audio/wav")).as("media_type"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: a real implementation would decode image/audio here
    * (e.g. via a vectorized native codec per partition). The fake derives
    * `dim` deterministic f32 features from payload bytes so downstream
    * vector operators (ANN, near-dup) are exercised end-to-end.
    * Runs via mapPartitions: one decoder init per partition (the real
    * codec-handle pattern), streaming rows through it.
    */
  def decodeStub(spark: SparkSession, media: DataFrame, dim: Int): DataFrame = {
    val outSchema = StructType(media.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = new Array[Float](dim)
        if (payload != null) {
          var i = 0
          while (i < payload.length) {
            feats(i % dim) += (payload(i) & 0xff) / 255.0f
            i += 1
          }
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling plumbing: split the opaque payload into fixed-size
    * chunks ("frames") — one row per frame, deterministic. The real
    * decoder would emit decoded frames; the chunking, explode shape, and
    * per-frame metadata are the Spark-side contract either way.
    * Output: (media_id, frame_idx: long, frame: binary, frame_len: long).
    */
  def frameSample(media: DataFrame, frameBytes: Int): DataFrame = {
    val n = col("n_bytes")
    val nFrames = ceil(n.cast("double") / frameBytes).cast("long")
    media
      .select(col("media_id"), col("payload"), n, nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)").as("frame"),
        least(lit(frameBytes.toLong), col("n_bytes") - col("frame_idx") * frameBytes).as("frame_len"))
  }

  /** Metadata + cheap payload stats, pure column ops (oracle-able):
    * byte length, payload md5, first/last byte.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      col("n_bytes"),
      md5(col("payload")).as("payload_md5"))
}
