package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.score.{Bm25, SmallFloat}
import graft.tokenize.CodeTokenizer

/** Catalyst-native functions: SQL-level tokenizer generator, trigram
  * array, codegen'd BM25 partial — must agree exactly with the pure-Scala
  * spec the engine and oracle share.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("code_tokens generator matches CodeTokenizer in SQL") {
    GraftFunctions.register(spark)
    val rows = Seq("parseHTTPResponse x_y", "if (foo) { bar2Baz }", "")
      .toDF("content")
    rows.createOrReplaceTempView("fx_docs")
    val got = spark.sql(
      "SELECT content, token FROM fx_docs LATERAL VIEW code_tokens(content) t AS token")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = Seq("parseHTTPResponse x_y", "if (foo) { bar2Baz }", "")
      .flatMap(c => CodeTokenizer.tokenize(c).map(c -> _))
    assert(got.toSeq.sorted == want.sorted)
  }

  test("term df via code_tokens SQL == termDf spec") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("fx_documents")
    val viaSql = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS df FROM fx_documents
        |LATERAL VIEW code_tokens(text) t AS token GROUP BY token""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaOps = graft.pipeline.TextOps.termDf(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaOps)
  }

  test("code_trigrams matches distinctTrigrams") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT code_trigrams('AbCde')").collect()(0)
      .getSeq[String](0)
    assert(got == CodeTokenizer.distinctTrigrams("AbCde").sorted.toSeq)
  }

  test("bm25_partial codegen agrees with the f32 scorer bit-for-bit") {
    GraftFunctions.register(spark)
    val avgdl = 57.3f
    val cache = Bm25.normCache(avgdl)
    val rows = (1 to 200).map(i => (i % 17 + 1, i % 256))
      .toDF("tf", "normId")
    val got = rows.selectExpr(
      s"tf", "normId",
      s"bm25_partial(tf, normId, CAST(1.75 AS FLOAT), CAST($avgdl AS FLOAT)) AS s")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
    got.foreach { case (tf, normId, s) =>
      assert(s == Bm25.partial(1.75f, tf, cache(normId & 0xff)))
    }
    // and it is NOT CodegenFallback: the plan compiles it inline
    // (use range() — a local Seq folds to LocalTableScan with no stage)
    val plan = spark.range(100)
      .selectExpr("CAST(id % 7 + 1 AS INT) AS tf", "CAST(id % 256 AS INT) AS normId")
      .selectExpr(
        s"bm25_partial(tf, normId, CAST(1.75 AS FLOAT), CAST($avgdl AS FLOAT)) AS s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("SmallFloat consistency: quantized ids round through the SQL path") {
    // normId stored as Byte in docs; SQL uses int 0..255
    (0 to 255).foreach { id =>
      assert(SmallFloat.DecodeTable(id) == SmallFloat.byte4ToInt(id.toByte))
    }
  }
}
