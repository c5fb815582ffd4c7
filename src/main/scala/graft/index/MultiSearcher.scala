package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Hit, Searcher}

/** Searcher over multiple index generations (base + deltas) with tombstone
  * filtering — the query-time face of IncrementalIndexer.
  *
  * Semantics (the Lucene/tantivy multi-segment model the reference runs
  * on, indexes.rs:244-246):
  *   - postings/docs: union over generations; tombstoned docIds excluded
  *     from results;
  *   - dict / corpus stats: aggregated over generations INCLUDING
  *     tombstoned docs — deleted docs keep contributing to df/avgdl until
  *     a compaction, exactly like Lucene deletes before a segment merge.
  *     After IncrementalIndexer.compact(), scores equal a from-scratch
  *     rebuild (IncrementalSpec).
  *
  * Physical paths: multi-path parquet reads (one scan over n generations),
  * the exhaustive scorer with a tombstone anti-join before top-k. The
  * block-max WAND path is disabled here because per-bucket heaps could
  * fill with tombstoned docs and starve live ones below k.
  */
class MultiSearcher(spark0: SparkSession, generations: Seq[String],
                    tombstones: DataFrame)
    extends Searcher(spark0, generations.head) {
  import spark0.implicits._

  require(generations.nonEmpty, "no live index generations")

  override lazy val postings: Dataset[PostingRun] =
    spark0.read.parquet(generations.map(g => s"$g/postings"): _*)
      .as[PostingRun]

  override lazy val dict: Dataset[DictEntry] =
    spark0.read.parquet(generations.map(g => s"$g/dict"): _*)
      .groupBy($"term")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"),
        max($"maxTfNorm").as("maxTfNorm"))
      .as[DictEntry]

  override lazy val stats: IndexStats = {
    val parts = generations.map(g =>
      spark0.read.parquet(s"$g/stats").as[IndexStats].head())
    val n = parts.map(_.n).sum
    val t = parts.map(_.totalTokens).sum
    IndexStats(n, t, if (n == 0) 0.0 else t.toDouble / n)
  }

  override lazy val docs: DataFrame =
    spark0.read.parquet(generations.map(g => s"$g/docs"): _*)
      .join(broadcast(tombstones), Seq("docId"), "left_anti")

  /** Tombstone filter before top-k; postings of dead docs still decode but
    * never surface.
    */
  override def scoreAll(terms: Seq[String], weights: Map[String, Float],
                        conjunctive: Boolean): Dataset[Hit] =
    super.scoreAll(terms, weights, conjunctive)
      .join(broadcast(tombstones), Seq("docId"), "left_anti")
      .as[Hit]

  /** Force the exhaustive path (see class doc). */
  override def search(terms0: Seq[String], k: Int, conjunctive: Boolean,
                      useWand: Boolean): Dataset[Hit] =
    super.search(terms0, k, conjunctive, useWand = false)
}
