package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for declared queries into plans/<tag>/ —
  * the optimization-round evidence files (<query>_<suffix>.txt). Usage:
  *
  *   sbt "runMain graft.tools.PlanDump <tag> <suffix> [query,query,…]"
  *
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.01 — plan shapes are
  * scale-independent), master local[SPARK_GRAFT_CPUS]. With no query list,
  * dumps every declared query whose DataFrame can be constructed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r06"
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    val qs = graft.SparkEntry.queries
    val names = only.getOrElse(qs.keySet).toSeq.sorted
    names.foreach { name =>
      qs.get(name) match {
        case None => println(s"SKIP unknown query $name")
        case Some(f) =>
          try {
            val df = f(spark, sfDir)
            val plan = df.queryExecution.explainString(
              ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
            println(s"WROTE plans/$tag/${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
