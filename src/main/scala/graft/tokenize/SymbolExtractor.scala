package graft.tokenize

/** Lightweight symbol (definition) extractor — the documented approximation
  * of the reference's tree-sitter scope-graph symbol pipeline
  * (server/bleep/src/indexes/file.rs:690-711 feeding the `symbols` field,
  * built by intelligence/scope_resolution.rs; SURVEY §2.2 D5 notes the
  * regex-extractor fallback as the Spark-scope choice).
  *
  * Spec: an identifier is a symbol definition iff it follows a definition
  * keyword separated by whitespace only, the keyword sits at a word
  * boundary, and the identifier starts with a letter or '_'. After a match
  * the scan resumes AFTER the identifier (the consumed-match semantics of
  * the original `keyword\s+(ident)` regex).
  *
  * Hand-rolled single-pass scanner, not java.util.regex: the regex version
  * was the postings map side's dominant cost AND showed zero thread
  * scaling (5.0k docs/s at 1 thread → 4.7k at 8; see TokenizeMicrobench
  * history) — the scanner is allocation-free until a match is found.
  */
object SymbolExtractor {

  private val Keywords: Set[String] = Set(
    "fn", "def", "func", "function", "class", "struct", "enum", "trait",
    "interface", "impl", "type", "let", "var", "val", "const", "public",
    "private", "static")
  private val MaxKeywordLen = Keywords.iterator.map(_.length).max

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Symbol definition RANGES — (start, end) char offsets of each
    * definition identifier, in order of appearance. The analog of the
    * reference's per-symbol byte ranges (symbol_locations, snippet.rs:157-162)
    * that symbol-mode snippets intersect highlights with.
    */
  def symbolRanges(content: String): Seq[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = content.length
    var i = 0
    while (i < n) {
      // find start of next word
      while (i < n && !isWordChar(content.charAt(i))) i += 1
      val wStart = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      val wLen = i - wStart
      if (wLen > 0 && wLen <= MaxKeywordLen &&
          Keywords.contains(content.substring(wStart, i))) {
        // require at least one whitespace char, then an identifier
        var j = i
        while (j < n && (content.charAt(j) == ' ' || content.charAt(j) == '\t' ||
            content.charAt(j) == '\n' || content.charAt(j) == '\r')) j += 1
        if (j > i && j < n) {
          val c = content.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_') {
            val idStart = j
            while (j < n && isWordChar(content.charAt(j))) j += 1
            out += ((idStart, j))
            i = j // consume the identifier (regex find() semantics)
          }
        }
      }
    }
    out.result()
  }

  /** Symbol definition NAMES found in the content (raw identifiers,
    * pre-tokenization), in order of appearance.
    */
  def symbolNames(content: String): Seq[String] =
    symbolRanges(content).map { case (s, e) => content.substring(s, e) }

  /** Tokenized symbol terms (lowercased sub-tokens of every definition
    * name) — what gets indexed under the "s:" namespace.
    */
  def symbolTerms(content: String): Seq[String] =
    symbolNames(content).flatMap(CodeTokenizer.tokenize)
}
