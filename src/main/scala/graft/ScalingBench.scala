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

  def runAt(cores: Int, nRepos: Int, filesPerRepo: Int): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpus = CorpusGen.synth(spark, nRepos, filesPerRepo, seed = 42L,
        partitions = cores * 2)
      val n = nRepos.toLong * filesPerRepo
      val root = Bench.freshDir(s"/tmp/graft-scaling-idx-$cores")
      val (_, t) = Bench.timed {
        new IndexBuilder(spark, root, bucketSize = 4096,
          numPartitions = cores * 2).build(corpus)
      }
      (t, n)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nRepos = if (args.length > 0) args(0).toInt else 60
    val filesPerRepo = if (args.length > 1) args(1).toInt else 150
    // N first, then 4N — separate SparkContexts, identical input
    val (t8, n) = runAt(8, nRepos, filesPerRepo)
    val (t32, _) = runAt(32, nRepos, filesPerRepo)
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
