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

  /** The fake payload is md5-derived, so DuckDB can reconstruct the
    * decoded features from `md5(text)` directly: body byte j from hex
    * digits 2j/2j+1, header w/h from bytes 0/1 (low 6 bits + 16), and the
    * stub's channel means over byte positions i % 3 == c. */
  def oracles: Map[String, String] = Map(
    "q32_multimodal_decode" ->
      """WITH b AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
             list_transform(range(0, 16), j ->
               (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+1 AS INT), 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+2 AS INT), 1)) - 1)) AS body
           FROM documents),
         m AS (
           SELECT doc_id, media_type,
             CAST(16 + (body[1] % 64) AS INT) AS width,
             CAST(16 + (body[2] % 64) AS INT) AS height,
             list_avg(list_transform([1,4,7,10,13,16], i -> CAST(body[i] AS DOUBLE))) AS m0,
             list_avg(list_transform([2,5,8,11,14], i -> CAST(body[i] AS DOUBLE))) AS m1,
             list_avg(list_transform([3,6,9,12,15], i -> CAST(body[i] AS DOUBLE))) AS m2
           FROM b)
         SELECT doc_id, media_type, width, height,
           round((m0 + m1 + m2) / 3, 4) AS mean_feature
         FROM m ORDER BY doc_id""")
}
