package graft.tokenize

import scala.collection.mutable

/** Code-aware tokenizer — the engine's single tokenization spec, shared by
  * index build, query compilation, and the in-repo oracle (rank identity
  * requires bit-identical token streams on all three paths).
  *
  * Reference behavior this replaces: bloop indexes raw 1–3-grams of every
  * text field via tantivy's `NgramTokenizer::new(1, 3, false)`
  * (reference: server/bleep/src/indexes.rs:249, indexes/schema.rs:73-86) and
  * re-derives case-permuted trigrams at query time
  * (query/compiler.rs:217-312). Our spec (SURVEY.md §7.3, a documented
  * divergence mandated by BASELINE.json.north_star): code-aware word tokens
  * — split on non-alphanumerics, then split snake_case and camelCase,
  * lowercase at index time — plus a query-side trigram fallback used only by
  * the regex prefilter path (RegexPlanner).
  *
  * Pure Scala, zero Spark deps: callable from `flatMap` on executors, from
  * the driver-side query compiler, and from the single-JVM oracle.
  */
object CodeTokenizer {

  /** Tokenize one string into lowercased sub-tokens, in order.
    *
    * Rules:
    *  1. maximal runs of `[A-Za-z0-9_]` are words; everything else is a
    *     separator;
    *  2. words split on `_` (snake_case);
    *  3. camelCase boundaries split: `aB` → `a|B`, `ABc` → `A|Bc`
    *     (so `parseHTTPResponse` → `parse`, `http`, `response`);
    *  4. letter↔digit transitions do NOT split (`utf8` stays one token);
    *  5. everything lowercased (ASCII+Unicode lower).
    */
  def tokenize(s: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) splitWord(s, start, i, out)
    }
    out.toArray
  }

  /** Term-frequency map of one document's tokens plus the document length
    * (total token count). Deterministic: iteration order is normalized by
    * the caller (postings are keyed and sorted by term downstream).
    */
  def termFreqs(s: String): (mutable.HashMap[String, Int], Int) = {
    val tf = mutable.HashMap.empty[String, Int]
    var len = 0
    val toks = tokenize(s)
    var i = 0
    while (i < toks.length) {
      tf.update(toks(i), tf.getOrElse(toks(i), 0) + 1)
      len += 1
      i += 1
    }
    (tf, len)
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Split s[from,until) (a `[A-Za-z0-9_]+` word) on '_' and camel
    * boundaries; lowercase; append non-empty pieces to out.
    */
  private def splitWord(s: String, from: Int, until: Int,
                        out: mutable.ArrayBuffer[String]): Unit = {
    var segStart = from
    var i = from
    while (i <= until) {
      val boundary =
        i == until ||
          s.charAt(i) == '_' ||
          (i > segStart && isCamelBoundary(s, i, until))
      if (boundary) {
        if (i > segStart) out += s.substring(segStart, i).toLowerCase
        segStart = if (i < until && s.charAt(i) == '_') i + 1 else i
        if (i < until && s.charAt(i) == '_') { i += 1 } else i += 1
      } else i += 1
    }
  }

  /** camel boundary before position i:
    *   lower|digit → Upper        (parse|Http)
    *   Upper → Upper followed by lower   (HTTP|Response: before the R)
    */
  @inline private def isCamelBoundary(s: String, i: Int, until: Int): Boolean = {
    val c = s.charAt(i)
    if (!c.isUpper) return false
    val prev = s.charAt(i - 1)
    if (prev.isLower || prev.isDigit) true
    else if (prev.isUpper && i + 1 < until && s.charAt(i + 1).isLower) true
    else false
  }

  /** Query-time sliding trigrams, char-based: the whole string if ≤3 chars,
    * else every 3-char window. Mirrors reference semantics at
    * query/compiler.rs:217-229 (tests :320-339).
    */
  def trigrams(s: String): Array[String] = {
    val cps = s.toCharArray // char-based like the reference's chars() windows
    if (cps.length <= 3) Array(s)
    else Array.tabulate(cps.length - 2)(i => new String(cps, i, 3))
  }

  /** All ASCII case permutations of a token, capped at 5 case-able chars —
    * parity re-implementation of reference query/compiler.rs:235-312 (cap
    * :22). Unused by the engine (we lowercase at index time, SURVEY §7.3);
    * kept for behavioral parity tests against the reference goldens.
    */
  def casePermutations(s: String): Seq[String] = {
    val lower = s.toLowerCase
    val caseable = lower.count(c => c.toUpper != c)
    if (caseable > 5) return Seq(s)
    var acc = List("")
    lower.foreach { c =>
      val variants = if (c.toUpper != c) Seq(c, c.toUpper) else Seq(c)
      acc = for (p <- acc; v <- variants) yield p + v
    }
    acc.reverse
  }
}
