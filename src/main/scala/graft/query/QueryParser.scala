package graft.query

/** The bloop query language (SURVEY §2.4, Q1–Q5): re-implementation of the
  * pest grammar (reference server/bleep/src/query/grammar.pest:1-57) and
  * `Expr::parse` + DNF flattening (query/parser.rs:487-574, 666-725,
  * merge/cross :89-153) as a hand-rolled recursive-descent parser (no
  * parser-combinator dep available offline).
  *
  * Surface: `repo: org: path: lang: branch: content: symbol: case: open:
  * global_regex:` labels; values bare, "double-quoted", 'single-quoted' or
  * /regex/; `or` alternation; parens; implicit AND by juxtaposition. The
  * parse result is a DNF: a list of flat [[FlatQuery]] where the list is an
  * OR of AND-merged branches — `(a or b) (c or d)` yields 4 branches
  * (parser.rs:117-136). Global flags (`case:`, `global_regex:`) found in any
  * branch apply to all (parser.rs:588-595). Two content targets AND-ed in
  * one branch join as the regex `lhs\s+rhs` (parser.rs:104-112).
  */
object QueryParser {

  /** A literal query value: plain text or /regex/. */
  case class QLit(value: String, isRegex: Boolean) {
    /** regex source for this literal (plain text gets quoted) —
      * reference parser.rs Literal::regex_str analog. */
    def regexStr: String =
      if (isRegex) value else java.util.regex.Pattern.quote(value)
  }

  sealed trait Target { def lit: QLit }
  case class ContentTarget(lit: QLit) extends Target
  case class SymbolTarget(lit: QLit) extends Target

  /** One flat (AND-merged) query branch — reference `Query<'a>`
    * (parser.rs:7-18).
    */
  case class FlatQuery(
      open: Option[Boolean] = None,
      caseSensitive: Option[Boolean] = None,
      globalRegex: Option[Boolean] = None,
      org: Option[QLit] = None,
      repo: Option[QLit] = None,
      path: Option[QLit] = None,
      lang: Option[String] = None,
      branch: Option[QLit] = None,
      target: Option[Target] = None) {

    /** AND-merge (reference parser.rs:89-115): RHS WINS — "overwriting
      * current terms by terms in the new query" — so the LATER label of a
      * duplicated field takes precedence (reference basic_parse golden:
      * `path:foo.c create_foo symbol:bar` keeps the symbol target). Two
      * content targets fuse into the regex `lhs\s+rhs`.
      */
    def merge(rhs: FlatQuery): FlatQuery = FlatQuery(
      open = rhs.open.orElse(open),
      caseSensitive = rhs.caseSensitive.orElse(caseSensitive),
      globalRegex = rhs.globalRegex.orElse(globalRegex),
      org = rhs.org.orElse(org),
      repo = rhs.repo.orElse(repo),
      path = rhs.path.orElse(path),
      lang = rhs.lang.orElse(lang),
      branch = rhs.branch.orElse(branch),
      target = (target, rhs.target) match {
        case (Some(ContentTarget(a)), Some(ContentTarget(b))) =>
          Some(ContentTarget(
            QLit(a.regexStr + "\\s+" + b.regexStr, isRegex = true)))
        case (a, b) => b.orElse(a)
      })
  }

  // ----------------------------------------------------------- expression
  private sealed trait Expr
  private case class Leaf(q: FlatQuery) extends Expr
  private case class EAnd(parts: Vector[Expr]) extends Expr
  private case class EOr(parts: Vector[Expr]) extends Expr

  /** Flatten to DNF (reference parser.rs:666-725 flatten + cross). */
  private def flatten(e: Expr): Vector[FlatQuery] = e match {
    case Leaf(q) => Vector(q)
    case EOr(ps) => ps.flatMap(flatten)
    case EAnd(ps) =>
      ps.map(flatten).reduceLeft { (acc, next) =>
        for (a <- acc; b <- next) yield a.merge(b) // cross product
      }
  }

  // --------------------------------------------------------------- lexer
  private final class P(val s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
  }

  /** Unescape quoted literal content (reference parser.rs:444-467):
    * `\n` `\t` `\\` and the escaped terminator.
    */
  def unescape(s: String, terminator: Char): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case t if t == terminator => sb.append(t); i += 2
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse one value: /regex/, "quoted", 'quoted' or bare token. */
  private def parseValue(p: P): QLit = {
    if (p.eof) return QLit("", isRegex = false)
    val c = p.peek
    if (c == '/' || c == '"' || c == '\'') {
      val term = c
      p.i += 1
      val sb = new StringBuilder
      // explicit escape-state scan: a terminator after an ESCAPED
      // backslash (e.g. "a\\") must still terminate
      var esc = false
      var done = false
      while (!p.eof && !done) {
        val ch = p.peek
        if (esc) { sb.append(ch); p.i += 1; esc = false }
        else if (ch == '\\') { sb.append(ch); p.i += 1; esc = true }
        else if (ch == term) { p.i += 1; done = true }
        else { sb.append(ch); p.i += 1 }
      }
      QLit(unescape(sb.toString, term), isRegex = term == '/')
    } else {
      val start = p.i
      while (!p.eof && !p.peek.isWhitespace && p.peek != ')' && p.peek != '(')
        p.i += 1
      QLit(p.s.substring(start, p.i), isRegex = false)
    }
  }

  private val Labels = Set("repo", "org", "path", "lang", "branch",
    "content", "symbol", "case", "open", "global_regex")

  private def parseAtom(p: P): Expr = {
    p.skipWs()
    if (p.peek == '(') {
      p.i += 1
      val e = parseOr(p)
      p.skipWs()
      if (!p.eof && p.peek == ')') p.i += 1
      e
    } else {
      // label:value or bare content target
      val save = p.i
      val labelEnd = {
        var j = p.i
        while (j < p.s.length && (p.s.charAt(j).isLetter || p.s.charAt(j) == '_')) j += 1
        j
      }
      if (labelEnd < p.s.length && p.s.charAt(labelEnd) == ':' &&
          Labels.contains(p.s.substring(p.i, labelEnd))) {
        val label = p.s.substring(p.i, labelEnd)
        p.i = labelEnd + 1
        val v = parseValue(p)
        Leaf(label match {
          case "repo" => FlatQuery(repo = Some(v))
          case "org" => FlatQuery(org = Some(v))
          case "path" => FlatQuery(path = Some(v))
          case "branch" => FlatQuery(branch = Some(v))
          case "lang" => FlatQuery(lang = Some(Languages.normalize(v.value)))
          case "content" => FlatQuery(target = Some(ContentTarget(v)))
          case "symbol" => FlatQuery(target = Some(SymbolTarget(v)))
          case "case" => FlatQuery(caseSensitive = Some(v.value == "sensitive"))
          case "open" => FlatQuery(open = Some(v.value == "true"))
          case "global_regex" => FlatQuery(globalRegex = Some(v.value == "true"))
        })
      } else {
        p.i = save
        Leaf(FlatQuery(target = Some(ContentTarget(parseValue(p)))))
      }
    }
  }

  private def parseAnd(p: P): Expr = {
    val parts = Vector.newBuilder[Expr]
    var n = 0
    while ({ p.skipWs(); !p.eof && p.peek != ')' && !atOrKeyword(p) }) {
      parts += parseAtom(p)
      n += 1
    }
    val v = parts.result()
    if (v.size == 1) v.head
    else if (v.isEmpty) Leaf(FlatQuery())
    else EAnd(v)
  }

  private def atOrKeyword(p: P): Boolean =
    p.s.regionMatches(p.i, "or", 0, 2) &&
      (p.i + 2 == p.s.length || p.s.charAt(p.i + 2).isWhitespace ||
        p.s.charAt(p.i + 2) == '(')

  private def parseOr(p: P): Expr = {
    var e = parseAnd(p)
    p.skipWs()
    while (!p.eof && atOrKeyword(p)) {
      p.i += 2
      val rhs = parseAnd(p)
      e = (e, rhs) match {
        case (EOr(a), EOr(b)) => EOr(a ++ b)
        case (EOr(a), b) => EOr(a :+ b)
        case (a, EOr(b)) => EOr(a +: b)
        case (a, b) => EOr(Vector(a, b))
      }
      p.skipWs()
    }
    e
  }

  /** Parse → DNF branches with global flags redistributed
    * (parser.rs:578-598).
    */
  def parse(input: String): Vector[FlatQuery] = {
    val p = new P(input)
    val branches = flatten(parseOr(p))
    // global flag redistribution (parser.rs:588-595)
    val caseFlag = branches.flatMap(_.caseSensitive).headOption
    val regexFlag = branches.flatMap(_.globalRegex).headOption
    branches.map { b =>
      b.copy(
        caseSensitive = b.caseSensitive.orElse(caseFlag),
        globalRegex = b.globalRegex.orElse(regexFlag))
    }
  }
}

/** Language alias / proper-case maps (reference query/languages.rs:5-19),
  * backed by [[LanguageData]] — generated from the reference's vendored
  * github-linguist languages.yml exactly like the reference's build step
  * (SURVEY §2.3 T6; 217 aliases / 470 languages, was a 12-entry hand map
  * in round 1).
  */
object Languages {
  /** reference parse_alias: raw alias lookup, else ascii-lowercase —
    * deliberately NOT a lowercased lookup ("TS" → "ts", not
    * "typescript"), matching languages.rs:5-11.
    */
  def normalize(s: String): String =
    LanguageData.ExtMap.getOrElse(s, s.toLowerCase)
  def properCase(s: String): String = {
    val n = normalize(s)
    LanguageData.ProperCaseMap.getOrElse(n, n)
  }
}
