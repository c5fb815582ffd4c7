package graft.query

import graft.tokenize.CodeTokenizer

/** Regex → index-predicate planner (SURVEY §2.5, P1–P4): re-implementation
  * of the reference's `planner::plan` (server/bleep/src/query/planner.rs:
  * 18-90), fragment algebra (:109-200) and optimize passes
  * (query/planner/optimize.rs:4-98) — the Cox/Zoekt literal-extraction
  * trick. A regex compiles to a Fragment tree whose leaves are literals the
  * match MUST contain; trigrams of those literals form an index prefilter
  * (superset of true matches), and `regexp_like` verifies exactly
  * (two-phase pattern, query/execute.rs:461-497).
  *
  * Pure driver-side code: the planned tree is tiny; only the resulting
  * term predicate touches the cluster.
  */
sealed trait Fragment
object Fragment {
  /** The match must contain this exact literal. */
  case class Lit(s: String) extends Fragment
  /** All children must be satisfied (concatenation / conjunction). */
  case class And(children: Vector[Fragment]) extends Fragment
  /** At least one child must be satisfied (alternation). */
  case class Or(children: Vector[Fragment]) extends Fragment
  /** Matches anything — anchors, `.`/`.*`, big classes, unbounded
    * repetition (reference `Fragment::Break`, planner.rs:33-56). */
  case object Break extends Fragment
}

object RegexPlanner {
  import Fragment._

  /** Char-class expansion bound — reference planner.rs:8 (classes with more
    * than 10 chars become Break).
    */
  val MaxClassSize = 10
  /** Alternation-distribution bound for concat-over-or (optimize pass). */
  val MaxDistribute = 32

  // ------------------------------------------------------------- algebra
  /** Concatenation: adjacent literals fuse; Break separates (reference
    * fragment `and`, planner.rs:109-160).
    */
  def concat(a: Fragment, b: Fragment): Fragment = (a, b) match {
    case (Lit(x), Lit(y)) => Lit(x + y)
    case (Or(xs), y) if xs.size <= MaxDistribute &&
        xs.forall(_.isInstanceOf[Lit]) =>
      xs.map(x => concat(x, y)).reduce(alt) // distribute-AND-over-OR
    case (x, Or(ys)) if ys.size <= MaxDistribute &&
        ys.forall(_.isInstanceOf[Lit]) =>
      ys.map(y => concat(x, y)).reduce(alt)
    case (And(xs), And(ys)) => fuseAnd(xs ++ ys)
    case (And(xs), y) => fuseAnd(xs :+ y)
    case (x, And(ys)) => fuseAnd(x +: ys)
    case (x, y) => fuseAnd(Vector(x, y))
  }

  private def fuseAnd(parts: Vector[Fragment]): Fragment = {
    // flatten nested Ands, fuse adjacent literals, drop redundant Breaks
    // and empty literals (no constraint)
    val flat = parts.flatMap {
      case And(cs) => cs
      case f => Vector(f)
    }.filterNot(_ == Lit(""))
    val out = Vector.newBuilder[Fragment]
    var pending: Option[Fragment] = None
    flat.foreach { f =>
      (pending, f) match {
        case (Some(Lit(x)), Lit(y)) => pending = Some(Lit(x + y))
        case (Some(Break), Break)   => () // fuse runs of Break
        case (Some(p), _)           => out += p; pending = Some(f)
        case (None, _)              => pending = Some(f)
      }
    }
    pending.foreach(out += _)
    val v = out.result()
    if (v.isEmpty) Lit("")
    else if (v.size == 1) v.head
    else And(v)
  }

  /** Alternation (reference fragment `or` + flatten_or). */
  def alt(a: Fragment, b: Fragment): Fragment = (a, b) match {
    case (Break, _) | (_, Break) => Break // anything-or-x matches anything
    case (Or(xs), Or(ys)) => Or(xs ++ ys)
    case (Or(xs), y) => Or(xs :+ y)
    case (x, Or(ys)) => Or(x +: ys)
    case (x, y) => Or(Vector(x, y))
  }

  // ------------------------------------------------------- regex parsing
  /** Minimal regex AST parser covering the constructs the reference's
    * planner handles (goldens at query/planner.rs:237-416): literals,
    * escapes, classes, `.`, anchors, groups, `|`, `* + ? {m,n}`.
    * Unsupported syntax degrades to Break (safe: weaker prefilter, exact
    * verify still applies).
    */
  def plan(pattern: String): Fragment =
    try planAlt(new P(pattern))
    catch { case _: Throwable => Break }

  private final class P(val s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def next(): Char = { val c = s.charAt(i); i += 1; c }
  }

  private def planAlt(p: P): Fragment = {
    var f = planConcat(p)
    while (!p.eof && p.peek == '|') {
      p.next()
      f = alt(f, planConcat(p))
    }
    f
  }

  private def planConcat(p: P): Fragment = {
    var f: Fragment = Lit("")
    while (!p.eof && p.peek != '|' && p.peek != ')') {
      f = concat(f, planRepeat(p))
    }
    f
  }

  private def planRepeat(p: P): Fragment = {
    val atom = planAtom(p)
    if (p.eof) return atom
    p.peek match {
      case '*' => p.next(); Break                        // zero or more
      case '+' => p.next(); concat(atom, Break)          // ≥1: atom then any
      case '?' => p.next(); Break                        // optional → no req
      case '{' =>
        val start = p.i
        p.next()
        val body = new StringBuilder
        while (!p.eof && p.peek != '}') body.append(p.next())
        if (p.eof) { p.i = start; atom } // unmatched '{' — treat literally
        else {
          p.next()
          val parts = body.toString.split(",", -1)
          val m = parts(0).toIntOption.getOrElse(0)
          if (m >= 1) {
            // atom{m,...} requires at least m copies; require one + Break
            if (parts.length == 1 && m <= 4) {
              var f = atom
              (2 to m).foreach(_ => f = concat(f, atom))
              f
            } else concat(atom, Break)
          } else Break
        }
      case _ => atom
    }
  }

  private def planAtom(p: P): Fragment = p.next() match {
    case '(' =>
      if (!p.eof && p.peek == '?') {
        p.next()
        if (!p.eof && (p.peek == '=' || p.peek == '!' || p.peek == '<')) {
          // lookaround: constrains position, not required content — skip
          // the (nesting-aware) body entirely, require nothing
          var depth = 1
          while (!p.eof && depth > 0) {
            p.next() match {
              case '\\' => if (!p.eof) p.next()
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
          }
          return Lit("")
        }
        // (?:...) group or (?flags) / (?flags:...) — skip the modifiers
        while (!p.eof && p.peek != ':' && p.peek != ')') p.next()
        if (!p.eof && p.peek == ':') p.next()
      }
      val f = planAlt(p)
      if (!p.eof && p.peek == ')') p.next()
      f
    case '[' => planClass(p)
    case '.' => Break
    case '^' | '$' => Break // anchors constrain position, not content
    case '\\' =>
      if (p.eof) Break
      else if (p.peek == 'Q') { // \Q…\E quotation (java.util.regex)
        p.next()
        val sb = new StringBuilder
        var done = false
        while (!p.eof && !done) {
          val c = p.next()
          if (c == '\\' && !p.eof && p.peek == 'E') { p.next(); done = true }
          else sb.append(c)
        }
        Lit(sb.toString)
      } else decodeEscape(p) match {
        case Some(s) => Lit(s)
        case None => Break
      }
    case c => Lit(c.toString)
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Decode one escape sequence positioned AFTER the backslash.
    *
    * Some(s): the escape denotes exactly the literal string s (its full
    * argument consumed — \x41, A, \0101 decode to their char so the
    * prefilter keeps its strength). None: a content-class / positional /
    * backref escape (\w \d \b \p{L} \1 \cX …) whose matched text is not a
    * fixed literal — the caller must emit Break. The argument is consumed
    * in BOTH cases: leaving `41` of an undecoded \x41 in the stream would
    * fuse into a FALSE required literal and silently drop matching docs
    * (round-1 ADVICE, high).
    */
  private def decodeEscape(p: P): Option[String] = p.next() match {
    case 'n' => Some("\n")
    case 't' => Some("\t")
    case 'r' => Some("\r")
    case 'f' => Some("\f")
    case 'a' => Some("\u0007")
    case 'e' => Some("\u001b")
    case '0' => // octal \0n \0nn \0mnn
      var v = 0
      var n = 0
      while (n < 3 && !p.eof && p.peek >= '0' && p.peek <= '7' &&
          (n < 2 || v <= 31)) {
        v = v * 8 + (p.next() - '0'); n += 1
      }
      if (n == 0) None else Some(v.toChar.toString)
    case 'x' =>
      if (!p.eof && p.peek == '{') { // \x{h…h}
        p.next()
        val sb = new StringBuilder
        while (!p.eof && p.peek != '}') sb.append(p.next())
        if (!p.eof) p.next()
        try Some(new String(Character.toChars(
          Integer.parseInt(sb.toString, 16))))
        catch { case _: Throwable => None }
      } else {
        val sb = new StringBuilder
        while (sb.length < 2 && !p.eof && isHex(p.peek)) sb.append(p.next())
        if (sb.length == 2)
          Some(Integer.parseInt(sb.toString, 16).toChar.toString)
        else None
      }
    case 'u' =>
      val sb = new StringBuilder
      while (sb.length < 4 && !p.eof && isHex(p.peek)) sb.append(p.next())
      if (sb.length == 4)
        Some(Integer.parseInt(sb.toString, 16).toChar.toString)
      else None
    case 'c' => // control char \cX
      if (!p.eof) p.next()
      None
    case 'p' | 'P' => // unicode class \pL / \p{…}: consume the spec
      if (!p.eof && p.peek == '{') { while (!p.eof && p.next() != '}') () }
      else if (!p.eof) p.next()
      None
    case 'k' => // named backref \k<name>
      if (!p.eof && p.peek == '<') { while (!p.eof && p.next() != '>') () }
      None
    case c if c >= '1' && c <= '9' => // numbered backref
      while (!p.eof && p.peek.isDigit) p.next()
      None
    case c if (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        c.isDigit => None // unknown alphanumeric escape: never a literal
    case c => Some(c.toString) // escaped punctuation IS the literal char
  }

  /** Char class: expanded to an alternation of single-char literals when it
    * has ≤ MaxClassSize members (reference planner.rs:33-56), else Break.
    * Negated classes are Break.
    */
  private def planClass(p: P): Fragment = {
    if (!p.eof && p.peek == '^') {
      // negated class → Break; skip the body honoring escapes so an
      // escaped \] does not end the class early
      var done = false
      while (!p.eof && !done) {
        p.next() match {
          case '\\' => if (!p.eof) p.next()
          case ']' => done = true
          case _ =>
        }
      }
      return Break
    }
    val chars = Vector.newBuilder[Char]
    var count = 0
    var broken = false
    var first = true
    // single decoded char, or ' ' with broken=true for class escapes
    // (\d, \p{L}, …) — same false-literal hazard as planAtom (ADVICE high)
    def classChar(): Char = {
      val c = p.next()
      if (c != '\\' || p.eof) c
      else decodeEscape(p) match {
        case Some(s) if s.length == 1 => s.charAt(0)
        case _ => broken = true; ' '
      }
    }
    while (!p.eof && (p.peek != ']' || first)) {
      first = false
      val c = classChar()
      if (!p.eof && p.peek == '-' && p.i + 1 < p.s.length &&
          p.s.charAt(p.i + 1) != ']') {
        p.next()
        val hi = classChar()
        if (hi >= c && hi - c + 1 + count <= MaxClassSize) {
          (c to hi).foreach(chars += _)
          count += hi - c + 1
        } else broken = true
      } else {
        chars += c
        count += 1
      }
      if (count > MaxClassSize) broken = true
    }
    if (!p.eof) p.next() // consume ']'
    if (broken) Break
    else chars.result().map(c => Lit(c.toString): Fragment)
      .reduceOption(alt).getOrElse(Break)
  }

  // ------------------------------------------------- gram extraction
  /** Trigrams every matching document MUST contain (superset-safe):
    *   Lit   → all 3-char windows of the lowercased literal (a <3-char
    *           literal constrains nothing — our index stores only 3-grams);
    *   And   → union of children;
    *   Or    → intersection of children (a gram is required only if every
    *           branch requires it);
    *   Break → nothing.
    */
  def requiredGrams(f: Fragment): Set[String] = f match {
    case Lit(s) =>
      if (s.length < 3) Set.empty
      else CodeTokenizer.distinctTrigrams(s).toSet
    case And(cs) => cs.map(requiredGrams).reduce(_ union _)
    case Or(cs) =>
      val sets = cs.map(requiredGrams)
      if (sets.exists(_.isEmpty)) Set.empty else sets.reduce(_ intersect _)
    case Break => Set.empty
  }
}
