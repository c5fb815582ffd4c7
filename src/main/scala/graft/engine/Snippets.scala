package graft.engine

import scala.collection.mutable

/** Snippet / highlight post-processing (SURVEY §2.9, N1–N3):
  * re-implementation of the reference Snipper pipeline (server/bleep/src/
  * snippet.rs:143-293) — run the target regex over a returned document's
  * content, expand each match by ±context lines using the stored
  * line-end indices, merge overlapping windows, and report per-snippet
  * highlight ranges.
  *
  * Pure driver-side Scala over the ≤k materialized hits (page size is 100
  * in the reference, query/execute.rs:25-27) — no distributed op needed.
  */
object Snippets {

  /** One highlighted snippet. lineStart/lineEnd are 0-based inclusive line
    * numbers; highlights are (start, end) char offsets RELATIVE to data.
    */
  case class Snippet(data: String, lineStart: Int, lineEnd: Int,
                     highlights: Seq[(Int, Int)])

  /** Line index of the char offset, via the lineEnds table (offsets of every
    * '\n', plus an implicit final line end — indexes/file.rs:713-721).
    */
  private def lineOf(lineEnds: Array[Int], offset: Int): Int = {
    var lo = 0
    var hi = lineEnds.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lineEnds(mid) < offset) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def lineStartOffset(lineEnds: Array[Int], line: Int): Int =
    if (line <= 0) 0 else lineEnds(line - 1) + 1
  private def lineEndOffset(lineEnds: Array[Int], line: Int): Int =
    lineEnds(math.min(line, lineEnds.length - 1))

  /** All snippets for one document (reference Snipper::all_for_doc,
    * snippet.rs:143-224 + expand/merge :226-293): regex match ranges →
    * ±context-line windows → merged when overlapping/adjacent.
    *
    * symbolRanges = Some(ranges) is SYMBOL MODE (find_symbols,
    * snippet.rs:144-205): a match survives only when fully contained in a
    * symbol-definition range — for `symbol:n` over
    * `const cool_beans = beans();` only the `n` inside the defined symbol
    * `cool_beans` highlights, not the ones in `const`/`beans()`.
    */
  def forDoc(content: String, lineEnds: Array[Int], pattern: String,
             caseSensitive: Boolean = false, context: Int = 1,
             symbolRanges: Option[Seq[(Int, Int)]] = None): Seq[Snippet] = {
    if (content.isEmpty || lineEnds.isEmpty) return Nil
    val re = java.util.regex.Pattern.compile(
      if (caseSensitive) pattern else "(?i)" + pattern)
    val m = re.matcher(content)
    val inSymbol: (Int, Int) => Boolean = symbolRanges match {
      case None => (_, _) => true
      case Some(rs) => (s, e) => rs.exists(r => s >= r._1 && e <= r._2)
    }
    // collect match ranges with their expanded line windows
    case class Win(fromLine: Int, toLine: Int, hl: (Int, Int))
    val wins = mutable.ArrayBuffer.empty[Win]
    while (m.find() && wins.size < 1000) {
      if (m.end() > m.start() && inSymbol(m.start(), m.end())) {
        val fromLine = math.max(0, lineOf(lineEnds, m.start()) - context)
        val toLine = math.min(lineEnds.length - 1,
          lineOf(lineEnds, math.max(m.start(), m.end() - 1)) + context)
        wins += Win(fromLine, toLine, (m.start(), m.end()))
      }
    }
    if (wins.isEmpty) return Nil
    // merge OVERLAPPING windows (expand_many, snippet.rs:265-293; adjacent
    // but non-overlapping windows stay separate snippets)
    val merged = mutable.ArrayBuffer.empty[(Int, Int, mutable.ArrayBuffer[(Int, Int)])]
    wins.foreach { w =>
      merged.lastOption match {
        case Some(last) if w.fromLine <= last._2 =>
          val upd = (last._1, math.max(last._2, w.toLine), last._3 += w.hl)
          merged(merged.size - 1) = upd
        case _ =>
          merged += ((w.fromLine, w.toLine, mutable.ArrayBuffer(w.hl)))
      }
    }
    merged.map { case (fromLine, toLine, hls) =>
      val start = lineStartOffset(lineEnds, fromLine)
      val end = math.min(content.length, lineEndOffset(lineEnds, toLine))
      Snippet(content.substring(start, end), fromLine, toLine,
        hls.map { case (s, e) =>
          (math.max(0, s - start), math.min(end, e) - start)
        }.toSeq)
    }.toSeq
  }

  /** Symbol-mode snippets with ranges from the indexed symbol extractor —
    * the find_symbols(true) Snipper configuration used for `symbol:`
    * targets (query/execute.rs builds the Snipper with find_symbols for
    * symbol queries).
    */
  def forDocSymbols(content: String, lineEnds: Array[Int], pattern: String,
                    caseSensitive: Boolean = false,
                    context: Int = 1,
                    /** language id of the doc: symbol ranges must come
                      * from the SAME per-language grammar the index's
                      * "s:" terms were extracted with, or hits matched
                      * via language-specific keywords (rust `mod`, scala
                      * `given`, …) would render zero snippets (round-4
                      * review).
                      */
                    lang: String = ""): Seq[Snippet] =
    forDoc(content, lineEnds, pattern, caseSensitive, context,
      Some(graft.tokenize.SymbolExtractor.symbolRanges(content, lang)))

  /** Highlight ranges of a pattern inside a short string (path / repo-name
    * results — reference HighlightedString.apply_regex, snippet.rs:296+).
    */
  def highlight(s: String, pattern: String,
                caseSensitive: Boolean = false): Seq[(Int, Int)] = {
    val re = java.util.regex.Pattern.compile(
      if (caseSensitive) pattern else "(?i)" + pattern)
    val m = re.matcher(s)
    val out = Vector.newBuilder[(Int, Int)]
    var idx = 0
    while (idx <= s.length && m.find(idx)) {
      if (m.end() > m.start()) {
        out += ((m.start(), m.end()))
        idx = m.end()
      } else idx = m.start() + 1 // zero-width: step past
    }
    out.result()
  }
}
