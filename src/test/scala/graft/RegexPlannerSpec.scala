package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Fragment, RegexPlanner}
import Fragment._

/** Planner goldens mirroring the reference's planner tests
  * (server/bleep/src/query/planner.rs:232-417) re-expressed over our
  * Fragment algebra.
  */
class RegexPlannerSpec extends AnyFunSuite {
  import RegexPlanner.{plan, requiredGrams}

  test("plain literal") {
    assert(plan("abcde") == Lit("abcde"))
    assert(requiredGrams(plan("abcde")) == Set("abc", "bcd", "cde"))
  }

  test("group flattens into literal: ab(cd)") {
    assert(plan("ab(cd)") == Lit("abcd"))
  }

  test("alternation distributes: (a|b|c)(de|fg)h") {
    val g = requiredGrams(plan("(a|b|c)(de|fg)h"))
    // every match contains one of {adeh,bdeh,cdeh,afgh,...}; required grams =
    // intersection over alternatives — nothing common of length 3
    assert(!g.contains("deh") || g == Set("deh")) // 'deh' only if all branches share it (they don't with fg)
    // the planner must at least be superset-safe: all of these match
    val re = "(a|b|c)(de|fg)h".r
    Seq("adeh", "bfgh", "cdeh").foreach { s =>
      assert(re.findFirstIn(s).isDefined)
      assert(g.forall(s.contains), s"gram set $g not contained in $s")
    }
  }

  test("top-level alternation: ab|cd") {
    val f = plan("ab|cd")
    assert(f == Or(Vector(Lit("ab"), Lit("cd"))))
    assert(requiredGrams(f).isEmpty) // branches share nothing
  }

  test("dot breaks literals: abc.def") {
    val f = plan("abc.def")
    assert(f == And(Vector(Lit("abc"), Break, Lit("def"))))
    assert(requiredGrams(f) == Set("abc", "def"))
  }

  test("unbounded repetition: abc.*def") {
    assert(requiredGrams(plan("abc.*def")) == Set("abc", "def"))
  }

  test("plus keeps one copy: abcz+def") {
    val g = requiredGrams(plan("abcz+def"))
    assert(g.contains("abc") && g.contains("bcz") && g.contains("def"))
    // all matches of abcz+def contain every required gram
    Seq("abczdef", "abczzzdef").foreach { s =>
      assert(g.forall(s.contains))
    }
  }

  test("composed: async+.fn.main") {
    val g = requiredGrams(plan("async+.fn.main"))
    Seq("asyncAfnBmain", "asynccc fn main").foreach { s =>
      assert(g.forall(gr => s.toLowerCase.contains(gr)), s"$g vs $s")
    }
  }

  test("small class expands: abc[d-f]g") {
    val f = plan("abc[d-f]g")
    val g = requiredGrams(f)
    Seq("abcdg", "abceg", "abcfg").foreach { s =>
      assert(g.forall(s.contains), s"$g not in $s")
    }
    // and it is selective: the common prefix grams are required
    assert(g.contains("abc"))
  }

  test("big class breaks") {
    assert(plan("[a-z]") == Break)
    assert(plan("[^x]") == Break)
  }

  test("negated class with escaped ] does not leak literals (regression)") {
    // [^\]]abc matches "xabc": the prefilter must not require "]ab"
    val g = requiredGrams(plan("[^\\]]abc"))
    assert(g.forall("xabc".contains), s"non-superset grams: $g")
    assert(g == Set("abc"))
  }

  test("lookarounds require nothing (regression)") {
    // (?!foo:bar)baz matches "baz " not followed by foo:bar — grams of the
    // lookahead body must not be required
    val g = requiredGrams(plan("(?!foo:bar)bazqux"))
    assert(g == Set("baz", "azq", "zqu", "qux"), s"$g")
    val g2 = requiredGrams(plan("(?<=pre:fix)tail"))
    assert(g2 == Set("tai", "ail"), s"$g2")
  }

  test("\\Q…\\E quotation (fused content targets, parser.rs:104-112)") {
    val f = plan("\\Qmerge\\E\\s+\\Qjoin\\E")
    assert(f == And(Vector(Lit("merge"), Break, Lit("join"))))
    assert(requiredGrams(f) == Set("mer", "erg", "rge", "joi", "oin"))
  }

  test("anchors and escapes") {
    assert(requiredGrams(plan("^abc$")) == Set("abc"))
    assert(plan("a\\.b") == Lit("a.b"))
    assert(requiredGrams(plan("\\w+")) == Set.empty)
  }

  test("optional does not over-require: ab?cde") {
    val g = requiredGrams(plan("ab?cde"))
    // "acde" is a match and must contain every required gram
    assert(g.forall("acde".contains), s"$g")
    assert(g.contains("cde"))
  }

  test("twin nested_or: deep alternations flatten (planner.rs nested_or)") {
    val f = plan("(((abc|def)|ghi)|jkl|((123|(456|(789))))|000)")
    assert(f == Or(Vector(Lit("abc"), Lit("def"), Lit("ghi"), Lit("jkl"),
      Lit("123"), Lit("456"), Lit("789"), Lit("000"))))
  }

  test("twin repetition: z* vanishes, z+ keeps one copy (planner.rs repetition)") {
    assert(plan("abc.*def") == And(Vector(Lit("abc"), Break, Lit("def"))))
    assert(plan("abcz*def") == And(Vector(Lit("abc"), Break, Lit("def"))))
    assert(plan("abcz+def") == And(Vector(Lit("abcz"), Break, Lit("def"))))
  }

  test("alphanumeric escapes decode or Break — never false literals (ADVICE r1)") {
    // decodable escapes keep prefilter strength
    assert(plan("foo\\x41bar") == Lit("fooAbar"))
    assert(plan("ab\\u0041cd") == Lit("abAcd"))
    assert(plan("ab\\0101cd") == Lit("abAcd")) // octal
    assert(plan("a\\x{1F600}b").isInstanceOf[Lit]) // astral \x{…}
    // content-class escapes must consume their argument and Break:
    // leaking "41"/"L" would create grams absent from true matches
    assert(requiredGrams(plan("foo\\dbar")) == Set("foo", "bar"))
    assert(requiredGrams(plan("foo\\pLbar")) == Set("foo", "bar"))
    assert(requiredGrams(plan("foo\\p{Lu}bar")) == Set("foo", "bar"))
    // group fuses with the following literal ("abcx" is truly required);
    // the backref itself Breaks (no false "xyz"-side fusion with \1)
    assert(requiredGrams(plan("(abc)x\\1yz")) == Set("abc", "bcx"))
    assert(requiredGrams(plan("foo\\cMbar")) == Set("foo", "bar"))
    // inside classes too: [\d] must not distribute a literal 'd'
    assert(requiredGrams(plan("foo[\\d]bar")) == Set("foo", "bar"))
    assert(requiredGrams(plan("foo[\\x41]bar")).contains("ooa")) // decodes
    // superset safety on real matcher semantics
    for ((pat, m) <- Seq("foo\\x20bar" -> "foo bar",
        "a\\x41{2}c" -> "aAAc", "v\\p{L}w" -> "vZw")) {
      assert(java.util.regex.Pattern.compile(pat).matcher(m).find(),
        s"$pat vs $m")
      val g = requiredGrams(plan(pat))
      assert(g.forall(m.toLowerCase.contains), s"pattern $pat grams $g")
    }
  }

  test("superset safety fuzz: every regex match contains all required grams") {
    val cases = Seq(
      "parse(Error|Warning)" -> Seq("parseError", "parseWarning"),
      "fn [a-c]{2}main" -> Seq("fn abmain", "fn ccmain"),
      "impl\\s+Display" -> Seq("impl Display", "impl  Display"),
      "x{3}y" -> Seq("xxxy"))
    cases.foreach { case (pat, matches) =>
      val g = requiredGrams(plan(pat))
      matches.foreach { m =>
        assert(java.util.regex.Pattern.compile(pat).matcher(m).find(), s"$pat vs $m")
        assert(g.forall(m.toLowerCase.contains), s"pattern $pat grams $g not all in '$m'")
      }
    }
  }
}
