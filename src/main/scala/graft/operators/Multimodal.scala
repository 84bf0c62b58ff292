package graft.operators

import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFeatures

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in partitions.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual media CODECS ARE STUBBED with a deterministic
  * fake format ("GRFT"), because no image/audio libraries exist in this
  * container — swap `decodeStub` for a real decoder (e.g. via
  * `mapInPandas`/`mapInArrow` with PIL/ffmpeg on PySpark, or a JNI codec
  * here) without touching any of the surrounding plan.
  *
  * Fake format (16-byte header, big-endian):
  *   magic "GRFT" | u8 kind (0=image 1=audio 2=video) | u8 channels |
  *   u16 width | u16 height | u32 payload_len | u16 fps_or_rate
  * followed by `payload_len` deterministic bytes.
  */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"

  final case class MediaMeta(
      id: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      rate: Int,
      payload_bytes: Long
  )

  /** Deterministic fake media blob for id (generator for tests/bench).
    * Header fields derive from `id` via plain modular arithmetic (NOT a
    * 64-bit mixer) so an independent SQL oracle can recompute the expected
    * metadata and verify the encode→decode round trip end-to-end; the
    * payload bytes stay mixer-generated (opaque, like real media).
    */
  def synthesize(id: Long): Array[Byte] = {
    val h = TextFeatures.mix64(id)
    val kind = (id % 3).toInt
    val channels = 1 + (id * 7 % 4).toInt
    val width = 16 + (id * 7919 % 1024).toInt
    val height = 16 + (id * 104729 % 1024).toInt
    val payloadLen = 64 + (id * 997 % 4096).toInt
    val rate = if (kind == 1) 16000 else 24
    val buf = ByteBuffer.allocate(16 + payloadLen)
    buf.putInt(Magic)
    buf.put(kind.toByte).put(channels.toByte)
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.putInt(payloadLen)
    buf.putShort(rate.toShort)
    var i = 0
    while (i < payloadLen) {
      buf.put((TextFeatures.mix64(h ^ i) & 0xff).toByte)
      i += 1
    }
    buf.array()
  }

  /** STUB decoder — parses the fake header only. A real implementation
    * would decode pixels/samples here; everything downstream (schema,
    * partition batching) is unchanged when it does.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes)
    if (buf.getInt() != Magic) return None
    val kind = buf.get() match {
      case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
    }
    val channels = buf.get().toInt
    val width = buf.getShort() & 0xffff
    val height = buf.getShort() & 0xffff
    val payloadLen = buf.getInt()
    val rate = buf.getShort() & 0xffff
    Some(MediaMeta(id, kind, width, height, channels, rate, payloadLen.toLong))
  }

  /** Decode a binary media column into typed metadata, partition-batched
    * (the `mapPartitions` here has the same batch shape a `mapInPandas`
    * decode would: one iterator of rows per task, vectorizable).
    * Corrupt/foreign blobs are dropped (counted upstream via the
    * difference in row counts).
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** "Resize" feature-extraction stub: computes target dims preserving
    * aspect ratio (the arithmetic is real; pixel resampling would slot in
    * where the payload passthrough is).
    */
  def resizePlan(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.toDF()
      .withColumn(
        "scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
      )
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .select(col("id"), col("kind"), col("width"), col("height"), col("out_w"), col("out_h"))
  }

  /** Frame-sampling stub for video rows: emits every `everyNth` frame
    * index up to a deterministic fake frame count (payload_bytes / 16).
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyNth: Int): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.filter(_.kind == "video")
      .flatMap { m =>
        val frames = (m.payload_bytes / 16).toInt
        (0 until frames by everyNth).map(f => (m.id, f, m.rate))
      }
      .toDF("id", "frame_idx", "fps")
  }
}
