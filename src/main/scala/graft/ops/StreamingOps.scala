package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming operators over the `events` table (SURVEY.md
  * §2.12: the reference itself is strictly batch — this is the engine's
  * streaming surface for the same aggregation semantics).
  *
  * The windowed aggregation is driven as a real streaming query
  * (readStream → watermark → tumbling window → memory sink, drained
  * synchronously with processAllAvailable), and its result equals the
  * batch SQL over the same data — which is exactly what the DuckDB
  * oracle checks with time_bucket.
  */
object StreamingOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 5-minute tumbling window count/sum per event_type, computed by a
    // genuine streaming query over the same parquet.
    "q33_stream_window_agg" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the streaming file source wants a directory: stage a symlink-free
      // copy under /tmp once per (dir) invocation
      val stage = java.nio.file.Files
        .createTempDirectory("graft_stream_src").toString
      val src = new java.io.File(s"$dir/events.parquet")
      val dst = new java.io.File(stage, "events.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)

      // unique per invocation: a memory-sink name collides on same-session
      // re-runs otherwise
      val queryName = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val stream = s.readStream.schema(schema).parquet(stage)
        // parquet stores TIMESTAMP_NTZ; watermarking requires TIMESTAMP —
        // session TZ is UTC, so the cast is value-preserving
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_c"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally {
        q.stop()
        // drop the staged copy — one leaked temp dir per invocation otherwise
        dst.delete(); new java.io.File(stage).delete()
      }
      s.table(queryName)
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n"), col("value_c"))
        .orderBy(col("w_start"), col("event_type"))
    }))

  def oracles: Map[String, String] = Map(
    "q33_stream_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
}
