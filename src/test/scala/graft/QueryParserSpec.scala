package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Languages, QueryParser}
import QueryParser._

/** Parser goldens mirroring the reference's parser tests
  * (server/bleep/src/query/parser.rs:727+).
  */
class QueryParserSpec extends AnyFunSuite {

  test("bare literal is a content target (parser.rs:735)") {
    val q = parse("ParseError")
    assert(q.size == 1)
    assert(q.head.target.contains(ContentTarget(QLit("ParseError", false))))
  }

  test("content: label (parser.rs:796)") {
    val q = parse("content:ParseError")
    assert(q.head.target.contains(ContentTarget(QLit("ParseError", false))))
  }

  test("composed filters AND-merge (parser.rs:747)") {
    val q = parse("org:bloopai repo:enterprise-search branch:origin/main ParseError")
    assert(q.size == 1)
    val b = q.head
    assert(b.org.contains(QLit("bloopai", false)))
    assert(b.repo.contains(QLit("enterprise-search", false)))
    assert(b.branch.contains(QLit("origin/main", false)))
    assert(b.target.contains(ContentTarget(QLit("ParseError", false))))
  }

  test("lang alias normalization (languages.rs:5-11)") {
    assert(parse("repo:r1 lang:rs parse").head.lang.contains("rust"))
    assert(Languages.normalize("TS") == "typescript")
    assert(Languages.properCase("rs") == "Rust")
  }

  test("DNF cross-merge (parser.rs:117-136)") {
    val q = parse("(repo:r1 or repo:r2) (lang:rust or lang:go) Error")
    assert(q.size == 4)
    assert(q.map(b => (b.repo.get.value, b.lang.get)).toSet ==
      Set(("r1", "rust"), ("r1", "go"), ("r2", "rust"), ("r2", "go")))
    assert(q.forall(_.target.contains(ContentTarget(QLit("Error", false)))))
  }

  test("or of plain targets") {
    val q = parse("foo or bar")
    assert(q.size == 2)
    assert(q.map(_.target.get.lit.value) == Vector("foo", "bar"))
  }

  test("global flags redistribute (parser.rs:588-595)") {
    val q = parse("case:sensitive (TOKEN or other)")
    assert(q.size == 2)
    assert(q.forall(_.caseSensitive.contains(true)))
    val q2 = parse("global_regex:true ab.c or de")
    assert(q2.forall(_.globalRegex.contains(true)))
  }

  test("regex literal /…/ and quoting") {
    val q = parse("""path:/.*\.rs/ content:"hello world"""")
    assert(q.head.path.contains(QLit(".*\\.rs", true)))
    assert(q.head.target.contains(ContentTarget(QLit("hello world", false))))
  }

  test("two content targets fuse into a \\s+ regex (parser.rs:104-112)") {
    val q = parse("content:foo content:bar")
    val t = q.head.target.get.lit
    assert(t.isRegex)
    assert(t.value == "\\Qfoo\\E\\s+\\Qbar\\E")
  }

  test("escaped backslash before closing quote terminates (regression)") {
    // content:"a\\" lang:rust — the quote after an ESCAPED backslash ends
    // the literal; lang must survive
    val q = parse("content:\"a\\\\\" lang:rust")
    assert(q.head.target.contains(ContentTarget(QLit("a\\", false))))
    assert(q.head.lang.contains("rust"))
  }

  test("unescape (parser.rs:444-467)") {
    assert(unescape("a\\nb", '"') == "a\nb")
    assert(unescape("a\\tb", '\'') == "a\tb")
    assert(unescape("a\\\"b", '"') == "a\"b")
    assert(unescape("a\\\\b", '"') == "a\\b")
  }

  test("symbol and case and open labels (grammar.pest:26-40)") {
    assert(parse("symbol:a").head.target.contains(SymbolTarget(QLit("a", false))))
    assert(parse("case:ignore token").head.caseSensitive.contains(false))
    assert(parse("open:true repo:x path:y").head.open.contains(true))
  }
}
