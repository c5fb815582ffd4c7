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
    assert(Languages.normalize("ts") == "typescript")
    // reference parse_alias: RAW alias lookup, fallback lowercase — an
    // uppercase alias spelling is not re-looked-up ("TS" → "ts")
    assert(Languages.normalize("TS") == "ts")
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

  // ---- named twins of the reference parser tests (parser.rs:727+)

  test("twin intersection_parse: or with asymmetric branches") {
    val q = parse("repo:foo ParseError or repo:bar")
    assert(q.size == 2)
    assert(q(0).repo.contains(QLit("foo", false)))
    assert(q(0).target.contains(ContentTarget(QLit("ParseError", false))))
    assert(q(1).repo.contains(QLit("bar", false)))
    assert(q(1).target.isEmpty)
    // flipped order
    val q2 = parse("repo:bar or repo:foo ParseError")
    assert(q2(0).repo.contains(QLit("bar", false)) && q2(0).target.isEmpty)
    assert(q2(1).repo.contains(QLit("foo", false)))
    assert(q2(1).target.contains(ContentTarget(QLit("ParseError", false))))
  }

  test("twin complex_nested_combinators_parse") {
    val q = parse(
      "(((repo:foo xyz) or repo:abc) (repo:fred or repo:grub) org:bloop)")
    // reference flattens to 4 branches; merge is rhs-wins so fred/grub
    // overwrite foo/abc (parser.rs complex_nested_combinators golden)
    assert(q.size == 4)
    assert(q.forall(_.org.contains(QLit("bloop", false))))
    val shapes = q.map(b => (b.repo.get.value, b.target.map(_.lit.value)))
    assert(shapes.toSet == Set(
      ("fred", Some("xyz")), ("grub", Some("xyz")),
      ("fred", None), ("grub", None)), s"got $shapes")
  }

  test("twin basic_parse: last target operator takes precedence") {
    val b = parse("path:foo.c create_foo symbol:bar").head
    assert(b.path.contains(QLit("foo.c", false)))
    assert(b.target.contains(SymbolTarget(QLit("bar", false))))
  }

  test("twin complex_multiple_parse_types") {
    val q = parse("(repo:bloop or repo:google) Parser or repo:zoekt Parsing " +
      "or (symbol:Compiler or (org:bloop repo:enterprise-search))")
    assert(q.size == 5)
    assert(q.count(_.target.exists(_.isInstanceOf[SymbolTarget])) == 1)
    assert(q.count(_.target.isEmpty) == 1) // the bare org+repo branch
  }

  test("twin slash_in_path") {
    assert(parse("path:foo/bar.js").head.path.contains(QLit("foo/bar.js", false)))
  }

  test("twin literal_join_as_regex") {
    // plain+plain → quoted \s+ fusion (covered above); regex operands keep
    // their source, plain operands get quoted
    val q = parse("/f(oo)/ /(bar|quux)/")
    val t = q.head.target.get.lit
    assert(t.isRegex && t.value == "f(oo)\\s+(bar|quux)")
    // plain operands with regex metachars get quoted (the reference uses
    // regex_syntax::escape; our spec uses \Q…\E — same match semantics)
    val q2 = parse("content:\"f(oo)\" content:\"(bar|quux)\"")
    val t2 = q2.head.target.get.lit
    assert(t2.isRegex)
    assert(t2.value == "\\Qf(oo)\\E\\s+\\Q(bar|quux)\\E")
  }

  test("twin lang_path_filter") {
    val b = parse("lang:Rust path:server").head
    assert(b.lang.contains("rust")) // normalized lowercase
    assert(b.path.contains(QLit("server", false)))
    assert(b.target.isEmpty)
  }

  test("twin enable_open") {
    assert(parse("open:true path:server/bleep/Cargo.toml").head.open
      .contains(true))
    assert(parse("open:false path:server/bleep/Cargo.toml").head.open
      .contains(false))
    assert(parse("path:server/bleep/Cargo.toml").head.open.isEmpty)
  }

  test("twin special_chars") {
    // bare tokens keep their backslashes verbatim (no unescaping)
    val b = parse("foo\\nbar\\tquux").head
    assert(b.target.contains(ContentTarget(QLit("foo\\nbar\\tquux", false))))
    // regex literal preserves class escapes
    val r = parse("/^\\b\\B\\w\\Wfoo\\d\\D$/").head.target.get.lit
    assert(r.isRegex && r.value == "^\\b\\B\\w\\Wfoo\\d\\D$")
  }

  test("twin test_global_regex") {
    val q1 = parse("global_regex:true foo").head
    assert(q1.globalRegex.contains(true))
    assert(q1.target.contains(ContentTarget(QLit("foo", false))))
    val q2 = parse("global_regex:true /foo/").head
    assert(q2.globalRegex.contains(true))
    assert(q2.target.contains(ContentTarget(QLit("foo", true))))
    assert(parse("foo").head.globalRegex.isEmpty)
    // flag set in ANY branch redistributes to all (parser.rs:588-595)
    val q3 = parse("global_regex:true foo or bar global_regex:false")
    assert(q3.forall(_.globalRegex.isDefined))
  }

  test("twin or_prefix / or_suffix: 'or'-shaped words are not the keyword") {
    assert(parse("org").head.target.contains(ContentTarget(QLit("org", false))))
    val q = parse("org or orange")
    assert(q.size == 2)
    assert(q.map(_.target.get.lit.value) == Vector("org", "orange"))
    assert(parse("for").head.target.contains(ContentTarget(QLit("for", false))))
    val q2 = parse("foo or for")
    assert(q2.map(_.target.get.lit.value) == Vector("foo", "for"))
  }
}
