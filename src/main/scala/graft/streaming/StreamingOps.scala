package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics operators: the `readStream → event-time window +
  * watermark → writeStream` surface of the prompt's streaming requirement,
  * expressed so the SAME plan runs in batch (withWatermark is a no-op on a
  * batch frame). Batch semantics are DuckDB-oracled (q_event_windows);
  * stream-vs-batch equality is proven by StreamingSpec.
  */
object StreamingOps {

  /** Tumbling 1-hour event-time windows with a 2-hour watermark over the
    * events table (event_id, user_id, event_type, ts, value): per
    * (window, event_type) row count and min/max value. Aggregates chosen
    * order-free (count/min/max) so results are exactly reproducible across
    * engines and across micro-batch boundaries. w_start is the window
    * start as epoch seconds (timezone-free).
    *
    * Scale: the state store keys on (window, event_type) — bounded by the
    * watermark horizon × type cardinality, not by the stream length; late
    * events beyond 2 hours are dropped exactly as a cluster deployment
    * would need.
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      // watermarks need TIMESTAMP, the corpus stores TIMESTAMP_NTZ; the
      // session runs UTC so the cast is epoch-preserving
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"))
      .select(col("window.start").cast("long").as("w_start"),
        col("event_type"), col("n"), col("min_v"), col("max_v"))
}
