package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("probe2")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", false).getOrCreate()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("PROBE ndocs=" + docs.count())
    println("PROBE words p50-ish=" + docs.selectExpr("size(split(text,' ')) as n").agg(avg("n"), max("n")).collect().mkString)
    def t(name: String)(f: => Any): Unit = { val s = System.nanoTime; f; println(s"PROBE $name: ${(System.nanoTime-s)/1e9}") }
    val q = TextOps.decontaminate(docs, TextOps.derivedEvalSet(docs))
    q.explain("extended")
    for (r <- 1 to 2) t(s"decon_$r") { q.agg(sum("n_matched")).collect() }
    spark.stop()
  }
}
