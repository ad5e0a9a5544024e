package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as a `mapPartitions` batch stage (the Scala analogue of
  * `mapInPandas`) — one decoder init per partition, batch-shaped work.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `StubDecoder.decode` parses a deterministic fake header
  * instead of real pixels. The Spark-side plumbing — binary column,
  * schema, partitioning, per-partition batching, feature output shape —
  * is real and tested.
  */
object Multimodal {

  /** Deterministic fake payload: 8-byte header (width, height as 2×Int)
    * + md5-derived body bytes. Stands in for an image blob. */
  def fakePayload(seedText: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val body = md.digest(seedText.getBytes("UTF-8"))
    val w = 16 + (body(0) & 0x3f)
    val h = 16 + (body(1) & 0x3f)
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(w).putInt(h).put(body)
    bb.array()
  }

  /** STUB decoder: a real impl would decode pixels here (??? territory);
    * this parses the fake header and emits per-"channel" byte means. */
  object StubDecoder extends Serializable {
    final case class Decoded(width: Int, height: Int, channelMeans: Array[Double])
    def decode(payload: Array[Byte]): Decoded = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      val w = bb.getInt(); val h = bb.getInt()
      val body = payload.drop(8)
      val means = (0 until 3).map { c =>
        val ch = body.zipWithIndex.collect { case (b, i) if i % 3 == c => (b & 0xff).toDouble }
        if (ch.isEmpty) 0.0 else ch.sum / ch.length
      }.toArray
      Decoded(w, h, means)
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType)))

  /** Build a media table (binary column + typed metadata) from documents,
    * then run the stub decode as a mapPartitions batch stage and emit
    * per-item features. Rows-only check (binary stage, no SQL oracle). */
  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio"))
            .as("media_type"),
          col("text"))
        .as[(Long, String, String)]
        .map { case (id, mt, text) => (id, mt, fakePayload(text)) }
        .toDF("doc_id", "media_type", "payload")
      // decode stage: one decoder per partition, batch-shaped
      val decoded = media.as[(Long, String, Array[Byte])].mapPartitions { it =>
        val dec = StubDecoder // real impl: init model/codec once here
        it.map { case (id, mt, p) =>
          val d = dec.decode(p)
          (id, mt, d.width, d.height, d.channelMeans)
        }
      }.toDF("doc_id", "media_type", "width", "height", "channel_means")
      decoded
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          round(expr("aggregate(channel_means, 0D, (a, x) -> a + x) / size(channel_means)"), 4)
            .as("mean_feature"))
        .orderBy(col("doc_id"))
    }))

  def oracles: Map[String, String] = Map()
}
