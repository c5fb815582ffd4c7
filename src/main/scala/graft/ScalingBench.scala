package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.IndexBuilder

/** N-vs-4N scaling evidence (BASELINE.json north_rule; sandbox stand-in per
  * driver instruction): run the SAME index build at local[8] and local[32]
  * on the SAME deterministic synthetic corpus, report files/sec at both and
  * the scaling efficiency eff = (T_8 / T_32) / (32/8). Writes/updates
  * `BENCH/BASELINE.md`.
  *
  * Usage: runMain graft.ScalingBench [nRepos] [filesPerRepo]
  */
object ScalingBench {

  val CorpusPath = "/tmp/graft-scaling-corpus"

  /** Materialize the synthetic corpus once (untimed): the metric is INDEX
    * throughput over an existing table, not generator throughput. Both
    * parallelism levels then read the identical parquet bytes.
    */
  def materializeCorpus(nRepos: Int, filesPerRepo: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaling-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      Bench.freshDir(CorpusPath)
      CorpusGen.synth(spark, nRepos, filesPerRepo, seed = 42L,
        partitions = 64)
        .write.mode("overwrite").parquet(CorpusPath)
    } finally spark.stop()
  }

  def runAt(cores: Int): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpus = spark.read.parquet(CorpusPath)
      val root = Bench.freshDir(s"/tmp/graft-scaling-idx-$cores")
      val b = new IndexBuilder(spark, root, bucketSize = 4096,
        numPartitions = cores * 2)
      val (_, tDocs) = Bench.timed(b.buildDocs(corpus))
      val (_, tPost) = Bench.timed(b.buildPostings(corpus))
      val (_, tDict) = Bench.timed(b.buildDict())
      System.err.println(
        f"[scaling] cores=$cores docs=$tDocs%.2fs postings=$tPost%.2fs dict=$tDict%.2fs")
      tDocs + tPost + tDict
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nRepos = if (args.length > 0) args(0).toInt else 150
    val filesPerRepo = if (args.length > 1) args(1).toInt else 400
    val n = nRepos.toLong * filesPerRepo
    materializeCorpus(nRepos, filesPerRepo)
    // N first, then 4N — separate SparkContexts, identical input
    val t8 = runAt(8)
    val t32 = runAt(32)
    val fps8 = n / t8
    val fps32 = n / t32
    val eff = (t8 / t32) / (32.0 / 8.0)
    val json =
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
      s""""files":$n,"t_local8_sec":${f"$t8%.2f"},"t_local32_sec":${f"$t32%.2f"},""" +
      s""""files_per_sec_8":${f"$fps8%.1f"},"files_per_sec_32":${f"$fps32%.1f"}}"""
    println(json)
    val md =
      s"""## Measured scaling (ScalingBench, synthetic corpus seed=42, $n files)
         |
         || parallelism | wall s | files/sec |
         ||---|---|---|
         || local[8]  (N)  | ${f"$t8%.2f"} | ${f"$fps8%.1f"} |
         || local[32] (4N) | ${f"$t32%.2f"} | ${f"$fps32%.1f"} |
         |
         |scaling efficiency (N→4N) = (T_N / T_4N) / 4 = **${f"$eff%.3f"}**
         |(target ≥ 0.8, BASELINE.json north_rule; same input, same seed,
         |rank-identity of query results across parallelism is enforced
         |separately by EngineSpec "parallelism invariance")
         |""".stripMargin
    val dir = new java.io.File("BENCH")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/BASELINE.md"), md)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/scaling.json"), json + "\n")
  }
}
