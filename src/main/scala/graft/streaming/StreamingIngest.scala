package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.index.IncrementalIndexer

/** Structured-Streaming ingest front-end for the incremental indexer: a
  * file-source stream over a corpus directory feeds each micro-batch into
  * IncrementalIndexer.ingest via foreachBatch.
  *
  * The reference has no streaming abstraction — indexing is a batch sweep
  * per repo sync (server/bleep/src/background/sync.rs:227-304; SURVEY
  * §1.4) — but its sync loop IS an unbounded arrival stream of changed
  * repos; this is that loop expressed as a Spark stream. Each micro-batch
  * reuses the batch builder unchanged, so all determinism/rank guarantees
  * carry over per generation.
  */
object StreamingIngest {

  val CorpusSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  /** Start ingesting parquet files appearing under `inputDir`. Use
    * `query.processAllAvailable()` to drain synchronously in tests/batch
    * catch-up, or let the trigger run continuously.
    */
  def start(spark: SparkSession, inputDir: String,
            indexer: IncrementalIndexer,
            checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(CorpusSchema)
      .parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        indexer.ingest(batch)
        ()
      }
      .start()
  }
}
