package graft.oracle

import scala.collection.mutable

import graft.query.RegexPlanner
import graft.score.{Bm25, SmallFloat}
import graft.tokenize.CodeTokenizer

/** Naive single-JVM reference engine (SURVEY §7.1 item 6): the same spec as
  * the Spark engine — same tokenizer, same SmallFloat quantization, same
  * f32 BM25 with ascending-term summation, same (score desc, docId asc)
  * tie-break — implemented brute-force in memory. This is the
  * "reference engine" of BASELINE.json.north_rule: the distributed engine
  * must be rank-identical (docIDs AND scores) to it on the reference query
  * set, at every parallelism level.
  *
  * Deliberately shares Bm25/SmallFloat/CodeTokenizer/RegexPlanner with the
  * engine so a spec bug cannot hide as a matching implementation bug in
  * only one of the two scoring paths — while the index layout, shuffle,
  * compression and top-k machinery are fully independent.
  */
class OracleEngine(rows: Seq[(String, String, String, String, String)],
                   branches: Map[(String, String), String] = Map.empty,
                   /** Mirror of IndexBuilder.shortContentGrams: 1–3-gram
                     * content windows (repo-name sub-index) instead of
                     * 3-grams only (main index).
                     */
                   shortContentGrams: Boolean = false) {
  // rows: (repo, path, commit, lang, content); branches: optional
  // (repo, path) → branch-list string (mirror of the schema-optional
  // branch column)

  case class ODoc(docId: Long, repo: String, path: String, commit: String,
                  lang: String, content: String, tf: Map[String, Int],
                  casedTf: Map[String, Int], symTf: Map[String, Int],
                  grams: Set[String], pGrams: Set[String], docLen: Int,
                  normId: Byte, indexed: Boolean, branch: String)

  val docs: Vector[ODoc] = {
    // docId = rank of docKey = sha256(repo ∥ '\0' ∥ path ∥ '\0' ∥ commit)
    // — must mirror IndexBuilder.withDocIds exactly. Rows beyond the
    // indexability limits become metadata-only stubs (D7), same as the
    // engine's buildDoc.
    rows.sortBy { case (r, p, c, _, content) =>
      (graft.corpus.CorpusGen.sha256Hex(r + "\u0000" + p + "\u0000" + c),
        graft.corpus.CorpusGen.sha256Hex(content)) // duplicate-docKey tiebreak
    }
      .zipWithIndex.map { case ((r, p, c, l, content), i) =>
        val br = branches.getOrElse((r, p), "")
        if (!graft.index.IndexBuilder.isIndexable(content))
          // stubs keep their PATH grams (mirror of the stubGrams path in
          // IndexBuilder.buildPostingsBody): path search sees them. Paths
          // take the full 1–3-gram window surface (format v9).
          ODoc(i + 1L, r, p, c, l, "", Map.empty, Map.empty, Map.empty,
            Set.empty, CodeTokenizer.distinctGrams123(p).toSet, 0, 0.toByte,
            indexed = false, branch = br)
        else {
          val (tf, docLen) = CodeTokenizer.termFreqs(content)
          // exact-case tf twin (the "c:" namespace, format v10)
          val (cT, cC, _) = CodeTokenizer.termFreqArraysCased(content)
          val casedTf = cT.indices.map(i2 => cT(i2) -> cC(i2)).toMap
          val g =
            if (shortContentGrams) CodeTokenizer.distinctGrams123(content).toSet
            else CodeTokenizer.distinctTrigrams(content).toSet
          val pg = CodeTokenizer.distinctGrams123(p).toSet
          val sym = mutable.HashMap.empty[String, Int]
          graft.tokenize.SymbolExtractor.symbolTerms(content, l).foreach { t =>
            sym.update(t, sym.getOrElse(t, 0) + 1)
          }
          ODoc(i + 1L, r, p, c, l, content, tf.toMap, casedTf, sym.toMap,
            g, pg, docLen, SmallFloat.intToByte4(docLen), indexed = true,
            branch = br)
        }
      }.toVector
  }

  val n: Long = docs.count(_.indexed).toLong
  val totalTokens: Long = docs.filter(_.indexed).map(_.docLen.toLong).sum
  val avgdl: Float =
    if (n == 0) 0f else (totalTokens.toDouble / n).toFloat
  private val normCache: Array[Float] = Bm25.normCache(avgdl)

  /** token term → df */
  val df: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.tf.keys.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1)))
    m.toMap
  }
  /** symbol term → df ("s:" namespace) */
  val symDf: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.symTf.keys.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1)))
    m.toMap
  }
  /** exact-case term → df ("c:" namespace) */
  val casedDf: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.casedTf.keys.foreach(t =>
      m.update(t, m.getOrElse(t, 0L) + 1)))
    m.toMap
  }
  /** content trigram → df */
  val gramDf: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.grams.foreach(g => m.update(g, m.getOrElse(g, 0L) + 1)))
    m.toMap
  }
  /** path trigram → df ("p:" namespace) */
  val pathGramDf: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.pGrams.foreach(g => m.update(g, m.getOrElse(g, 0L) + 1)))
    m.toMap
  }

  private def topK(hits: Seq[(Long, Float)], k: Int): Seq[(Long, Float)] =
    hits.sortBy { case (d, s) => (-s, d) }.take(k)

  /** Conjunctive literal search — the reference's plain content target. */
  def searchLiteral(text: String, k: Int): Seq[(Long, Float)] = {
    val terms = CodeTokenizer.tokenize(text).distinct.sorted
    if (terms.isEmpty) return Nil
    if (terms.exists(t => df.getOrElse(t, 0L) == 0L)) return Nil
    val weights = terms.map(t => Bm25.weight(df(t), n))
    val hits = docs.flatMap { d =>
      if (terms.forall(d.tf.contains)) {
        var s = 0f
        var i = 0
        while (i < terms.length) {
          s += Bm25.partial(weights(i), d.tf(terms(i)), normCache(d.normId & 0xff))
          i += 1
        }
        Some(d.docId -> s)
      } else None
    }
    topK(hits, k)
  }

  /** Literal search with DocumentTweaker factors (mirror of
    * Searcher.searchLiteralTweaked; lastCommit = 0 on this corpus).
    */
  def searchLiteralTweaked(text: String, k: Int, now: Long): Seq[(Long, Float)] = {
    val base = searchLiteralAll(text)
    topK(base.map { case (id, s) =>
      val d = byId(id)
      val avgLineLength =
        if (d.content.isEmpty) 0.0
        else {
          var lines = 0
          var i = 0
          while (i < d.content.length) {
            if (d.content.charAt(i) == '\n') lines += 1
            i += 1
          }
          if (d.content.last != '\n') lines += 1
          d.content.length.toDouble / math.max(lines, 1)
        }
      id -> graft.score.Tweaker(s, d.lang != null && d.lang.nonEmpty,
        avgLineLength, 0L, now)
    }, k)
  }

  /** Unranked conjunctive literal hits. */
  def searchLiteralAll(text: String): Seq[(Long, Float)] = {
    val terms = CodeTokenizer.tokenize(text).distinct.sorted
    if (terms.isEmpty) return Nil
    conjunctiveHits(terms.toSeq, d => d.tf, df)
  }

  /** Disjunctive (OR) multi-term search — WAND semantics. */
  def searchAny(terms0: Seq[String], k: Int): Seq[(Long, Float)] = {
    val terms = terms0.distinct.sorted
    val weights = terms.map(t => Bm25.weight(df.getOrElse(t, 0L), n))
    val hits = docs.flatMap { d =>
      var s = 0f
      var any = false
      var i = 0
      while (i < terms.length) {
        d.tf.get(terms(i)).foreach { tf =>
          any = true
          s += Bm25.partial(weights(i), tf, normCache(d.normId & 0xff))
        }
        i += 1
      }
      if (any) Some(d.docId -> s) else None
    }
    topK(hits, k)
  }

  // ------------------------------------------------------- query language
  /** Mirror of QueryExecutor.execute — same dispatch, same branch-union f32
    * sum in branch order, same tie-break.
    */
  def executeQuery(input: String, k: Int): Seq[(Long, Float)] = {
    import graft.query.QueryParser
    import QueryParser.{ContentTarget, FlatQuery, QLit, SymbolTarget}
    val branches = QueryParser.parse(input)
    def pathScoredLit(b: FlatQuery): Option[QLit] = b.path match {
      // mirror of QueryExecutor.pathIsScored: any non-empty plain literal
      // scores (format v9 indexes 1–3-gram path windows)
      case Some(l) if !l.isRegex && l.value.nonEmpty => Some(l)
      case _ => None
    }
    def metaPred(b: FlatQuery, includePath: Boolean)(d: ODoc): Boolean = {
      def sub(field: String, l: QLit): Boolean =
        java.util.regex.Pattern.compile("(?i)" +
            (if (l.isRegex) l.value
             else java.util.regex.Pattern.quote(l.value.toLowerCase)))
          .matcher(field.toLowerCase).find()
      // org: matches the owner SEGMENT (orgOf), like the repo reader —
      // mirrors QueryExecutor.filterDocs (round-3 review)
      b.org.forall(sub(graft.engine.QueryExecutor.orgOf(d.repo), _)) &&
        b.repo.forall(sub(d.repo, _)) &&
        (!includePath || b.path.forall(sub(d.path, _))) &&
        b.branch.forall(sub(d.branch, _)) &&
        b.lang.forall(_ == d.lang)
    }
    // mirror of QueryExecutor.pathHits: 10 × conjunctive BM25 over path
    // trigrams (tf=1, content normId), substring-verified
    def pathHits(l: QLit): Seq[(Long, Float)] = {
      val grams = CodeTokenizer.distinctTrigrams(l.value.toLowerCase)
        .toSeq.sorted
      if (grams.exists(g => pathGramDf.getOrElse(g, 0L) == 0L)) return Nil
      val weights = grams.map(g => Bm25.weight(pathGramDf(g), n))
      val needle = l.value.toLowerCase
      docs.flatMap { d =>
        if (grams.forall(d.pGrams.contains) &&
            d.path.toLowerCase.contains(needle)) {
          var s = 0f
          var i = 0
          while (i < grams.length) {
            s += Bm25.partial(weights(i), 1, normCache(d.normId & 0xff))
            i += 1
          }
          Some(d.docId -> 10f * s)
        } else None
      }
    }
    def branchHits(b: FlatQuery): Seq[(Long, Float)] = {
      val caseSens = b.caseSensitive.getOrElse(false)
      val targetScored: Option[Seq[(Long, Float)]] = b.target map {
        case ContentTarget(l)
            if l.isRegex || b.globalRegex.contains(true) =>
          regexHitsAll(l.value, caseSens)
        case ContentTarget(l) if !caseSens =>
          conjunctiveHits(
            CodeTokenizer.tokenize(l.value).distinct.sorted.toSeq,
            d => d.tf, df)
        case ContentTarget(l) => // case:sensitive scores the EXACT-CASE
          // namespace (reference case-preserved terms, compiler.rs:235-312)
          // then byte-verifies the raw literal — format v10 parity
          val base = conjunctiveHits(
            CodeTokenizer.tokenizeCased(l.value).distinct.sorted.toSeq,
            d => d.casedTf, casedDf)
          val pat = java.util.regex.Pattern.compile(
            java.util.regex.Pattern.quote(l.value))
          base.filter { case (id, _) =>
            pat.matcher(byId(id).content).find()
          }
        case SymbolTarget(l) =>
          conjunctiveHits(
            CodeTokenizer.tokenize(l.value).distinct.sorted.toSeq,
            d => d.symTf, symDf)
      }
      val pLit = pathScoredLit(b)
      val pathScored: Option[Seq[(Long, Float)]] = pLit.map(pathHits)
      val scored: Seq[(Long, Float)] = (targetScored, pathScored) match {
        case (Some(t), Some(p)) => // intersection; f32 ts + ps, fixed order
          val pm = p.toMap
          t.flatMap { case (id, ts) => pm.get(id).map(ps => (id, ts + ps)) }
        case (Some(t), None) => t
        case (None, Some(p)) => p
        case (None, None) => docs.map(d => (d.docId, 0f))
      }
      scored.filter { case (id, _) =>
        metaPred(b, includePath = pLit.isEmpty)(byId(id))
      }
    }
    val perDoc = mutable.HashMap.empty[Long, mutable.ArrayBuffer[(Int, Float)]]
    branches.zipWithIndex.foreach { case (b, i) =>
      branchHits(b).foreach { case (id, s) =>
        perDoc.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += ((i, s))
      }
    }
    val hits = perDoc.iterator.map { case (id, parts) =>
      var s = 0f
      parts.sortBy(_._1).foreach(p => s += p._2)
      (id, s)
    }.toSeq
    topK(hits, k)
  }

  private def byId(id: Long): ODoc = docs((id - 1).toInt)

  /** Conjunctive BM25 hits over a term map accessor (tf or symTf), all
    * matching docs, score = f32 sum in ascending term order.
    */
  private def conjunctiveHits(terms: Seq[String],
                              tfOf: ODoc => Map[String, Int],
                              dfMap: Map[String, Long]): Seq[(Long, Float)] = {
    if (terms.isEmpty) return Nil
    if (terms.exists(t => dfMap.getOrElse(t, 0L) == 0L)) return Nil
    val weights = terms.map(t => Bm25.weight(dfMap(t), n))
    docs.flatMap { d =>
      val tf = tfOf(d)
      if (terms.forall(tf.contains)) {
        var s = 0f
        var i = 0
        while (i < terms.length) {
          s += Bm25.partial(weights(i), tf(terms(i)), normCache(d.normId & 0xff))
          i += 1
        }
        Some(d.docId -> s)
      } else None
    }
  }

  /** Unranked two-phase regex hits (mirror of Searcher.regexAll). */
  def regexHitsAll(pattern: String,
                   caseSensitive: Boolean): Seq[(Long, Float)] = {
    val grams = RegexPlanner.requiredGrams(RegexPlanner.plan(pattern))
      .toSeq.sorted
    if (grams.exists(g => gramDf.getOrElse(g, 0L) == 0L)) return Nil
    val weights = grams.map(g => Bm25.weight(gramDf.getOrElse(g, 0L), n))
    val re = java.util.regex.Pattern.compile(
      if (caseSensitive) pattern else "(?i)" + pattern)
    docs.flatMap { d =>
      if (grams.forall(d.grams.contains) && re.matcher(d.content).find()) {
        var s = 0f
        var i = 0
        while (i < grams.length) {
          s += Bm25.partial(weights(i), 1, normCache(d.normId & 0xff))
          i += 1
        }
        Some(d.docId -> s)
      } else None
    }
  }

  /** Two-phase regex: trigram prefilter + exact verify, scored by BM25 over
    * the plan's required grams (tf = 1, the distinct-gram convention) —
    * same spec as Searcher.searchRegex.
    */
  def searchRegex(pattern: String, k: Int,
                  caseSensitive: Boolean = false): Seq[(Long, Float)] =
    topK(regexHitsAll(pattern, caseSensitive), k)

  /** Conjunctive BM25 over the content-trigram namespace (tf = 1), no
    * verify — the scored candidate set of a plain repo-name query.
    */
  def gramConjunctiveHits(grams: Seq[String]): Seq[(Long, Float)] = {
    if (grams.isEmpty) return Nil
    if (grams.exists(g => gramDf.getOrElse(g, 0L) == 0L)) return Nil
    val weights = grams.map(g => Bm25.weight(gramDf(g), n))
    docs.flatMap { d =>
      if (grams.forall(d.grams.contains)) {
        var s = 0f
        var i = 0
        while (i < grams.length) {
          s += Bm25.partial(weights(i), 1, normCache(d.normId & 0xff))
          i += 1
        }
        Some(d.docId -> s)
      } else None
    }
  }

  /** Mirror of IndexBuilder.buildRepoIndex: an inner oracle whose docs are
    * the distinct repo names (content = name), docIds = the same sha-rank.
    */
  lazy val repoOracle: OracleEngine =
    new OracleEngine(rows.map(_._1).distinct.map(nm => (nm, "", "", "", nm)),
      shortContentGrams = true)

  /** Mirror of QueryExecutor.executeRepo — same branch routing
    * (RepoReader query_matches), same scored-then-any-verify order, same
    * branch-order f32 union sum, same (score desc, repoId asc) tie-break.
    * Returns (repoId, name, score).
    */
  def executeRepoQuery(input: String, k: Int): Seq[(Long, String, Float)] = {
    import graft.query.QueryParser
    import QueryParser.FlatQuery
    val branches = QueryParser.parse(input).filter { b =>
      !b.open.contains(true) && b.repo.isDefined && b.path.isEmpty &&
        b.target.isEmpty
    }
    require(branches.nonEmpty, s"no repo-routed branch in: $input")
    def branchHits(b: FlatQuery): Seq[(Long, Float)] = {
      val l = b.repo.get
      val caseSens = b.caseSensitive.getOrElse(false)
      if (l.isRegex) repoOracle.regexHitsAll(l.value, caseSens)
      else repoOracle.gramConjunctiveHits( // short literals = one short gram
        CodeTokenizer.distinctTrigrams(l.value.toLowerCase).toSeq.sorted)
    }
    val perDoc = mutable.HashMap.empty[Long, mutable.ArrayBuffer[(Int, Float)]]
    branches.zipWithIndex.foreach { case (b, i) =>
      branchHits(b).foreach { case (id, s) =>
        perDoc.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += ((i, s))
      }
    }
    // per-branch byte filter: name pattern, AND the org segment pattern on
    // org-qualified branches (mirror of QueryExecutor.executeRepo)
    val patterns = branches.map { b =>
      val caseSens = b.caseSensitive.getOrElse(false)
      def pat(l: QueryParser.QLit) =
        java.util.regex.Pattern.compile((if (caseSens) "" else "(?i)") +
          (if (l.isRegex) l.value else java.util.regex.Pattern.quote(l.value)))
      (pat(b.repo.get), b.org.map(pat))
    }
    val hits = perDoc.iterator.flatMap { case (id, parts) =>
      val name = repoOracle.docs((id - 1).toInt).repo
      val org = graft.engine.QueryExecutor.orgOf(name)
      if (patterns.exists { case (np, op) =>
          np.matcher(name).find() && op.forall(_.matcher(org).find()) }) {
        var s = 0f
        parts.sortBy(_._1).foreach(p => s += p._2)
        Some((id, name, s))
      } else None
    }.toSeq
    hits.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }
}
