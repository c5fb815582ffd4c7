package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusSource

class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def goodDf = Seq(
    ("r1", "a/b.rs", "c" * 40, "rust", "fn main() {}"))
    .toDF("repo", "path", "commit", "lang", "content")

  test("validated accepts the contract schema and canonicalizes order, " +
    "dropping extra columns") {
    val shuffled = goodDf
      .withColumn("extra", lit(7))
      .select("extra", "content", "lang", "commit", "path", "repo")
    val v = CorpusSource.validated(shuffled)
    assert(v.columns.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    assert(v.count() == 1)
  }

  test("validated keeps known optional columns (contentSha, branch) " +
    "and type-checks them") {
    val withOpt = goodDf
      .withColumn("branch", lit("main"))
      .withColumn("contentSha", sha2(col("content"), 256))
      .withColumn("noise", lit(1))
    val v = CorpusSource.validated(withOpt)
    assert(v.columns.toSeq ==
      Seq("repo", "path", "commit", "lang", "content", "contentSha", "branch"))
    val badOpt = goodDf.withColumn("branch", lit(5))
    val e = intercept[IllegalArgumentException] {
      CorpusSource.validated(badOpt)
    }
    assert(e.getMessage.contains("optional column branch"))
  }

  test("validated fails fast naming every missing/mistyped column") {
    val missing = goodDf.drop("commit")
    val e1 = intercept[IllegalArgumentException] {
      CorpusSource.validated(missing)
    }
    assert(e1.getMessage.contains("missing column commit"))
    val mistyped = goodDf.withColumn("lang", lit(3))
    val e2 = intercept[IllegalArgumentException] {
      CorpusSource.validated(mistyped)
    }
    assert(e2.getMessage.contains("column lang"))
  }

  test("fromDocuments produces the validated corpus shape with " +
    "sha-derived commits") {
    val dir = TestSpark.tempDir("sources-docs")
    Seq((1L, "hello world", "en", "repoA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val c = CorpusSource.fromDocuments(spark, dir).collect().head
    assert(c.getString(0) == "repoA" && c.getString(1) == "doc/1")
    assert(c.getString(2).length == 40) // sha256 prefix commit
    assert(c.getString(4) == "hello world")
  }
}
