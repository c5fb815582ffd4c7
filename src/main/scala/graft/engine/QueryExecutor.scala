package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
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
  *     if /…/) on the repo column, `path:` likewise on path, `lang:` exact
  *     on the normalized lang; `branch:` parses but matches everything —
  *     the input_hint corpus carries no branch column (documented
  *     divergence; the reference indexes per-doc branch lists,
  *     indexes/file.rs:575).
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
  */
class QueryExecutor(searcher: Searcher) {
  import searcher.spark.implicits._

  def execute(input: String, k: Int): Dataset[Hit] = {
    val branches = QueryParser.parse(input)
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
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  /** Filtered doc set for a branch's metadata labels, as a docId column. */
  private def filterDocs(b: FlatQuery): Option[DataFrame] = {
    var pred: Option[org.apache.spark.sql.Column] = None
    def and(c: org.apache.spark.sql.Column): Unit =
      pred = Some(pred.map(_ && c).getOrElse(c))
    def subOrRegex(colName: String, l: QLit): Unit =
      and(regexp_like(lower(col(colName)),
        lit("(?i)" + (if (l.isRegex) l.value else
          java.util.regex.Pattern.quote(l.value.toLowerCase)))))
    b.org.foreach(l => subOrRegex("repo", l))
    b.repo.foreach(l => subOrRegex("repo", l))
    b.path.foreach(l => subOrRegex("path", l))
    b.lang.foreach(l => and(col("lang") === l))
    pred.map(p => searcher.docs.filter(p).select("docId"))
  }

  private def branchHits(b: FlatQuery): Dataset[Hit] = {
    val caseSens = b.caseSensitive.getOrElse(false)
    val scored: Dataset[Hit] = b.target match {
      case None =>
        searcher.docs.select($"docId").as[Long].map(Hit(_, 0f))
      case Some(ContentTarget(l)) if l.isRegex || b.globalRegex.contains(true) =>
        searcher.regexAll(l.value, caseSens)
          .select($"docId", $"score").as[Hit]
      case Some(ContentTarget(l)) =>
        val terms = CodeTokenizer.tokenize(l.value).distinct.sorted.toSeq
        val base = scoreConjunctive(terms)
        if (!caseSens) base
        else { // exact-literal post-verify, case-sensitive
          val pat = java.util.regex.Pattern.quote(l.value)
          base.toDF().join(searcher.docs, "docId")
            .filter(regexp_like($"content", lit(pat)))
            .select($"docId", $"score").as[Hit]
        }
      case Some(SymbolTarget(l)) =>
        val terms = CodeTokenizer.tokenize(l.value).distinct.sorted
          .map("s:" + _).toSeq
        scoreConjunctive(terms)
    }
    filterDocs(b) match {
      case None => scored
      case Some(fd) =>
        scored.toDF().join(fd, "docId").select($"docId", $"score").as[Hit]
    }
  }

  private def scoreConjunctive(terms: Seq[String]): Dataset[Hit] = {
    if (terms.isEmpty) return searcher.spark.emptyDataset[Hit]
    val ts = searcher.termStats(terms)
    if (terms.exists(t => ts(t)._1 == 0L))
      return searcher.spark.emptyDataset[Hit]
    searcher.scoreAll(terms, ts.map { case (t, (_, w)) => t -> w },
      conjunctive = true)
  }
}
