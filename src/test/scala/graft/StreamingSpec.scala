package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Structured Streaming operator semantics: the watermarked windowed
  * aggregation must produce, in complete mode after draining, exactly the
  * batch plan's result over the same input — micro-batch boundaries and
  * state-store round trips must not change a single row.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermarked windowed agg: stream (complete mode) == batch") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(src).schema
    // two arrival chunks → at least two micro-batches through the state store
    val dir = TestSpark.tempDir("stream-events")
    val all = spark.read.parquet(src)
    all.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
      .write.mode("append").parquet(dir)
    all.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingOps.windowedEventCounts(stream)
      .writeStream.format("memory").queryName("wm_counts")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    val got = spark.table("wm_counts").collect().map(key).toSet
    val want = StreamingOps.windowedEventCounts(
      spark.read.parquet(dir)).collect().map(key).toSet
    assert(got == want && got.nonEmpty)
  }
}
