package graft

import graft.corpus.CorpusGen
import graft.engine.Searcher
import graft.index.IndexBuilder

/** Dump the formatted physical plans PLANS.md documents — run via
  * `sbt "Test/runMain graft.PlanDump <name>"` to refresh a section after a
  * plan-affecting change. Names: fuzzy_short, repo_short, snippet_page.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val root = TestSpark.tempDir("plandump")
    new IndexBuilder(spark, root, bucketSize = 64, numPartitions = 3)
      .build(CorpusGen.synth(spark, 6, 15, seed = 3L))
    val searcher = new Searcher(spark, root)
    val exec = new graft.engine.QueryExecutor(searcher)
    args.headOption.getOrElse("fuzzy_short") match {
      case "fuzzy_short" =>
        graft.engine.FuzzyPath.candidates(searcher, "f1").explain("formatted")
      case "repo_short" =>
        exec.executeRepo("repo:or", 10).explain("formatted")
      case "snippet_page" =>
        exec.executeWithSnippets("parse", 10).explain("formatted")
      case other => sys.error(s"unknown plan: $other")
    }
    spark.stop()
  }
}
