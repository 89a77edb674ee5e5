package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.queries.QueryDef

/** Structured Streaming surface. The reference is bounded-batch only
  * (every source is a BoundedSource, range_source.py:29 — SURVEY §2.9),
  * so this goes beyond parity: the same event tables processed as a
  * stream, with event-time windows and watermark-driven finalization.
  *
  * The pipeline shape is the production one — `readStream` → event-time
  * window aggregation with a watermark → sink; at 100 TB the sink is
  * files/Kafka and the trigger a real schedule. Here the bounded run
  * uses Trigger.AvailableNow and a memory sink so the result is a
  * DataFrame the oracle gate can hash: append mode emits exactly the
  * windows the final watermark passes, which is deterministic on
  * bounded input (windows ending after the last event stay open and
  * unemitted — the oracle replicates that cutoff).
  */
object StreamOps {

  /** events schema for readStream (streaming requires it up front); ts
    * is TIMESTAMP(NANOS) in the files, which Spark only reads as long
    * (spark.sql.legacy.parquet.nanosAsLong) — converted to micros in
    * the stream, exactly like the batch path (Tables.t). */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- s01
    // Hourly event-time windows with a zero-delay watermark, append
    // output: only windows whose end the final watermark (= max event
    // time) has passed are emitted. One shuffle (window+type keys) with
    // streaming partial aggregation — the unbounded-data shape of q16.
    QueryDef(
      "s01_stream_hourly_windows",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val stream = s.readStream.schema(eventsSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          .withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
               sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .select(unix_micros(col("window.start")).as("hour_start_us"),
                  col("event_type"), col("n_events"), col("sum_value"))
        val name = "s01_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(name).orderBy("hour_start_us", "event_type")
      },
      Some("""
        WITH ev AS (SELECT *, time_bucket(INTERVAL 1 HOUR, ts) AS hour_start FROM events)
        SELECT epoch_us(hour_start) AS hour_start_us, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM ev
        WHERE hour_start + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)
        GROUP BY 1, 2 ORDER BY hour_start_us, event_type"""))
  )
}
