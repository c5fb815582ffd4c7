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
  def tokenize(s: String): Array[String] = tokenize(s, lower = true)

  /** Case-PRESERVING tokenization: identical split rules, no lowercasing —
    * feeds the "c:" exact-case posting namespace that `case:sensitive`
    * scoring runs on (reference terms are stored case-preserved and
    * case-insensitive queries permute, compiler.rs:235-312; we keep the
    * lowercased namespace for one-lookup insensitive queries and this one
    * for exact-case parity, SURVEY §7.3).
    */
  def tokenizeCased(s: String): Array[String] = tokenize(s, lower = false)

  private def tokenize(s: String, lower: Boolean): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) splitWord(s, start, i, out, lower)
    }
    out.toArray
  }

  /** Term frequencies as parallel arrays (terms sorted ascending, counts
    * aligned) plus the document length. Sort-and-count instead of a boxed
    * HashMap: the postings map side runs this per document at full core
    * count, where allocation rate — not CPU — was the measured scaling
    * limiter (see ScalingBench history).
    */
  def termFreqArrays(s: String): (Array[String], Array[Int], Int) =
    termFreqFromTokens(tokenize(s))

  /** Exact-case term frequencies (the "c:" namespace's tf source). */
  def termFreqArraysCased(s: String): (Array[String], Array[Int], Int) =
    termFreqFromTokens(tokenizeCased(s))

  /** Lowercase one already-split token with the shared per-char rule;
    * returns the SAME reference when nothing changes (the common all-
    * lowercase case allocates nothing). tokenize(s) ==
    * tokenizeCased(s).map(lowerToken) by construction — split boundaries
    * ignore case — which lets the index build tokenize each doc ONCE
    * (CodeTokenizerSpec asserts the identity).
    */
  def lowerToken(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && lowerChar(s.charAt(i)) == s.charAt(i)) i += 1
    if (i == n) return s
    val b = new Array[Char](n)
    var k = 0
    while (k < n) { b(k) = lowerChar(s.charAt(k)); k += 1 }
    new String(b)
  }

  private[graft] def termFreqFromTokens(
      toks: Array[String]): (Array[String], Array[Int], Int) = {
    val len = toks.length
    if (len == 0) return (Array.empty, Array.empty, 0)
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    val terms = new Array[String](len)
    val counts = new Array[Int](len)
    var n = 0
    var i = 0
    while (i < len) {
      var j = i + 1
      while (j < len && toks(j) == toks(i)) j += 1
      terms(n) = toks(i)
      counts(n) = j - i
      n += 1
      i = j
    }
    (java.util.Arrays.copyOf(terms, n), java.util.Arrays.copyOf(counts, n), len)
  }

  /** Term-frequency map of one document's tokens plus the document length
    * (total token count). Convenience wrapper over termFreqArrays.
    */
  def termFreqs(s: String): (mutable.HashMap[String, Int], Int) = {
    val (terms, counts, len) = termFreqArrays(s)
    val tf = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < terms.length) { tf.update(terms(i), counts(i)); i += 1 }
    (tf, len)
  }

  /** Locale-free per-char lowercase (ASCII fast path). Shared by engine AND
    * oracle so gram normalization is one spec (slightly differs from
    * String.toLowerCase on multi-char mappings like ß — documented).
    */
  @inline def lowerChar(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else Character.toLowerCase(c)

  /** Distinct trigrams of the lowercased string, allocation-light: windows
    * are deduplicated as packed 48-bit longs (3 UTF-16 chars) in an open
    * -addressing long set; only the distinct survivors materialize as
    * Strings. Strings ≤3 chars yield themselves (lowercased) — reference
    * trigrams() semantics (query/compiler.rs:217-229).
    */
  def distinctTrigrams(s: String): Array[String] =
    distinctTrigrams(s, "")

  /** Distinct trigrams as packed codes: length (1–3) in bits 48–49, the
    * UTF-16 chars in bits 0–47 (c0<<32 | c1<<16 | c2, left-aligned).
    * Explicit length makes the decode exact even for grams containing NUL
    * chars (a "\0\0\0" window would otherwise be indistinguishable from a
    * short gram's zero padding). The shuffle-friendly form: a posting
    * keyed by a long sorts and serializes several times cheaper than its
    * 5-char string.
    */
  def distinctTrigramCodes(s: String): Array[Long] = {
    val n = s.length
    if (n == 0) return Array.empty
    if (n <= 3) {
      var code = 0L
      var i = 0
      while (i < n) { code = (code << 16) | lowerChar(s.charAt(i)).toLong; i += 1 }
      code <<= 16 * (3 - n)
      return Array(code | (n.toLong << 48))
    }
    val set = new LongSet(math.min(1 << 16, Integer.highestOneBit(n) * 4))
    val lenBits = 3L << 48
    var c0 = lowerChar(s.charAt(0))
    var c1 = lowerChar(s.charAt(1))
    var i = 2
    while (i < n) {
      val c2 = lowerChar(s.charAt(i))
      set.add(lenBits | (c0.toLong << 32) | (c1.toLong << 16) | c2.toLong)
      c0 = c1
      c1 = c2
      i += 1
    }
    val out = new Array[Long](set.size)
    var k = 0
    set.foreach { packed => out(k) = packed; k += 1 }
    out
  }

  /** Distinct 1-, 2- AND 3-gram windows of the lowercased string as packed
    * codes — the full reference `NgramTokenizer::new(1, 3, false)` surface
    * (server/bleep/src/indexes.rs:249): every window of each length, so a
    * 1–2-char query is an index lookup instead of a column scan. Used for
    * the PATH namespace and the repo-name sub-index, where the distinct
    * short-gram set is small and bounded; content keeps 3-grams only
    * (SURVEY §7.3 — a content 1-gram posting at 10^12 docs is df≈N for
    * every byte, and nothing queries it: word terms are indexed whole).
    */
  def distinctGramCodes123(s: String): Array[Long] = {
    val n = s.length
    if (n == 0) return Array.empty
    val set = new LongSet(math.min(1 << 16,
      math.max(16, Integer.highestOneBit(n) * 8)))
    var i = 0
    while (i < n) {
      val c0 = lowerChar(s.charAt(i)).toLong
      set.add((1L << 48) | (c0 << 32))
      if (i + 1 < n) {
        val c1 = lowerChar(s.charAt(i + 1)).toLong
        set.add((2L << 48) | (c0 << 32) | (c1 << 16))
        if (i + 2 < n)
          set.add((3L << 48) | (c0 << 32) | (c1 << 16) |
            lowerChar(s.charAt(i + 2)).toLong)
      }
      i += 1
    }
    val out = new Array[Long](set.size)
    var k = 0
    set.foreach { packed => out(k) = packed; k += 1 }
    out
  }

  /** String form of distinctGramCodes123 (oracle gram sets / tests). */
  def distinctGrams123(s: String): Array[String] =
    distinctGramCodes123(s).map(decodeTrigram)

  /** Decode a packed trigram code back to its exact string (inverse of
    * distinctTrigramCodes).
    */
  def decodeTrigram(code: Long): String = {
    val len = ((code >>> 48) & 3).toInt
    val b = new Array[Char](3)
    b(0) = ((code >>> 32) & 0xffff).toChar
    b(1) = ((code >>> 16) & 0xffff).toChar
    b(2) = (code & 0xffff).toChar
    new String(b, 0, if (len == 0) 3 else len)
  }

  /** As above, with each gram string built directly as `prefix + gram`
    * (posting-namespace strings like "g:abc" without a second concat pass).
    */
  def distinctTrigrams(s: String, prefix: String): Array[String] = {
    val n = s.length
    val pl = prefix.length
    if (n == 0) return Array.empty
    if (n <= 3) {
      val b = new Array[Char](pl + n)
      prefix.getChars(0, pl, b, 0)
      var i = 0
      while (i < n) { b(pl + i) = lowerChar(s.charAt(i)); i += 1 }
      return Array(new String(b))
    }
    val set = new LongSet(math.min(1 << 16, Integer.highestOneBit(n) * 4))
    var c0 = lowerChar(s.charAt(0))
    var c1 = lowerChar(s.charAt(1))
    var i = 2
    while (i < n) {
      val c2 = lowerChar(s.charAt(i))
      set.add((c0.toLong << 32) | (c1.toLong << 16) | c2.toLong)
      c0 = c1
      c1 = c2
      i += 1
    }
    val out = new Array[String](set.size)
    var k = 0
    set.foreach { packed =>
      val b = new Array[Char](pl + 3)
      prefix.getChars(0, pl, b, 0)
      b(pl) = ((packed >>> 32) & 0xffff).toChar
      b(pl + 1) = ((packed >>> 16) & 0xffff).toChar
      b(pl + 2) = (packed & 0xffff).toChar
      out(k) = new String(b)
      k += 1
    }
    out
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Split s[from,until) (a `[A-Za-z0-9_]+` word) on '_' and camel
    * boundaries; lowercase unless `lower` is off; append non-empty pieces
    * to out.
    */
  private def splitWord(s: String, from: Int, until: Int,
                        out: mutable.ArrayBuffer[String],
                        lower: Boolean = true): Unit = {
    var segStart = from
    var i = from
    while (i <= until) {
      val boundary =
        i == until ||
          s.charAt(i) == '_' ||
          (i > segStart && isCamelBoundary(s, i, until))
      if (boundary) {
        if (i > segStart) {
          val b = new Array[Char](i - segStart)
          var k = segStart
          while (k < i) {
            b(k - segStart) =
              if (lower) lowerChar(s.charAt(k)) else s.charAt(k)
            k += 1
          }
          out += new String(b)
        }
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
    if (cps.length == 0) Array.empty // reference: trigrams("") is empty
    else if (cps.length <= 3) Array(s)
    else Array.tabulate(cps.length - 2)(i => new String(cps, i, 3))
  }

  /** Minimal open-addressing set of longs (power-of-two capacity, linear
    * probing, 0 as the empty-slot marker with an explicit hasZero flag —
    * a window of three NUL chars packs to code 0, so 0 IS a valid member
    * for binary-ish content). No boxing, no per-entry allocation.
    */
  final class LongSet(initialCapacity: Int) {
    private var cap = math.max(16, Integer.highestOneBit(initialCapacity) * 2)
    private var table = new Array[Long](cap)
    private var n = 0
    private var hasZero = false
    def size: Int = n + (if (hasZero) 1 else 0)
    def add(v: Long): Unit = {
      if (v == 0L) { hasZero = true; return }
      if (n * 4 >= cap * 3) grow()
      var idx = hash(v) & (cap - 1)
      while (true) {
        val cur = table(idx)
        if (cur == 0L) { table(idx) = v; n += 1; return }
        if (cur == v) return
        idx = (idx + 1) & (cap - 1)
      }
    }
    def foreach(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var i = 0
      while (i < cap) { if (table(i) != 0L) f(table(i)); i += 1 }
    }
    @inline private def hash(v: Long): Int = {
      val h = v * -7046029254386353131L
      (h ^ (h >>> 32)).toInt
    }
    private def grow(): Unit = {
      val old = table
      cap *= 2
      table = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < old.length) { if (old(i) != 0L) add(old(i)); i += 1 }
    }
  }

  /** All ASCII case permutations of a token, capped at 5 case-able chars —
    * parity re-implementation of reference query/compiler.rs:235-312 (cap
    * :22). Unused by the engine (we lowercase at index time, SURVEY §7.3);
    * kept for behavioral parity tests against the reference goldens.
    */
  def casePermutations(s: String): Seq[String] = {
    val lower = s.toLowerCase
    val caseablePos = lower.indices.filter(i => lower(i).toUpper != lower(i))
    if (caseablePos.size > 5) return Seq(s)
    // mask order matches the reference exactly (bit i = i-th caseable
    // char uppercased, mask ascending — compiler.rs:287-312 goldens)
    (0 until (1 << caseablePos.size)).map { mask =>
      val sb = new StringBuilder(lower)
      caseablePos.zipWithIndex.foreach { case (pos, bit) =>
        if ((mask & (1 << bit)) != 0) sb.setCharAt(pos, lower(pos).toUpper)
      }
      sb.toString
    }
  }
}
