package graft.tokenize

/** Lightweight symbol (definition) extractor — the documented approximation
  * of the reference's tree-sitter scope-graph symbol pipeline
  * (server/bleep/src/indexes/file.rs:690-711 feeding the `symbols` field,
  * built by intelligence/scope_resolution.rs; SURVEY §2.2 D5 notes the
  * regex-extractor fallback as the Spark-scope choice).
  *
  * One pass over each line: a definition keyword (union of the common
  * keywords across the corpus languages) followed by an identifier marks
  * that identifier as a symbol. The identifier is then split with the
  * shared CodeTokenizer so `symbol:` queries and content queries agree on
  * token form.
  */
object SymbolExtractor {

  private val DefPattern = java.util.regex.Pattern.compile(
    "(?:^|[^A-Za-z0-9_])" +
      "(?:fn|def|func|function|class|struct|enum|trait|interface|impl|type|let|var|val|const|public|private|static)" +
      "\\s+([A-Za-z_][A-Za-z0-9_]*)")

  /** Symbol definition NAMES found in the content (raw identifiers,
    * pre-tokenization), in order of appearance.
    */
  def symbolNames(content: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val m = DefPattern.matcher(content)
    while (m.find()) out += m.group(1)
    out.result()
  }

  /** Tokenized symbol terms (lowercased sub-tokens of every definition
    * name) — what gets indexed under the "s:" namespace.
    */
  def symbolTerms(content: String): Seq[String] =
    symbolNames(content).flatMap(CodeTokenizer.tokenize)
}
