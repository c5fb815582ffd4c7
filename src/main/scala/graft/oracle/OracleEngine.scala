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
class OracleEngine(rows: Seq[(String, String, String, String, String)]) {
  // rows: (repo, path, commit, lang, content)

  case class ODoc(docId: Long, repo: String, path: String, commit: String,
                  lang: String, content: String, tf: Map[String, Int],
                  grams: Set[String], docLen: Int, normId: Byte)

  val docs: Vector[ODoc] = {
    val kept = rows.filter { case (_, _, _, _, c) =>
      c.getBytes("UTF-8").length <= 600000 &&
        (c.split("\n", -1).length <= 20001)
    }
    kept.sortBy { case (r, p, c, _, _) => (r, p, c) }
      .zipWithIndex.map { case ((r, p, c, l, content), i) =>
        val (tf, docLen) = CodeTokenizer.termFreqs(content)
        val lc = content.toLowerCase
        val g = mutable.HashSet.empty[String]
        if (lc.nonEmpty && lc.length <= 3) g += lc
        var j = 0
        while (j + 3 <= lc.length) { g += lc.substring(j, j + 3); j += 1 }
        ODoc(i + 1L, r, p, c, l, content, tf.toMap, g.toSet, docLen,
          SmallFloat.intToByte4(docLen))
      }.toVector
  }

  val n: Long = docs.size.toLong
  val totalTokens: Long = docs.map(_.docLen.toLong).sum
  val avgdl: Float =
    if (n == 0) 0f else (totalTokens.toDouble / n).toFloat
  private val normCache: Array[Float] = Bm25.normCache(avgdl)

  /** token term → df */
  val df: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.tf.keys.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1)))
    m.toMap
  }
  /** content trigram → df */
  val gramDf: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    docs.foreach(_.grams.foreach(g => m.update(g, m.getOrElse(g, 0L) + 1)))
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

  /** Two-phase regex: trigram prefilter + exact verify, scored by BM25 over
    * the plan's required grams (tf = 1, the distinct-gram convention) when
    * the plan is conjunctive, else 0 — same spec as Searcher.searchRegex.
    */
  def searchRegex(pattern: String, k: Int,
                  caseSensitive: Boolean = false): Seq[(Long, Float)] = {
    val grams = RegexPlanner.requiredGrams(RegexPlanner.plan(pattern))
      .toSeq.sorted
    val weights = grams.map(g => Bm25.weight(gramDf.getOrElse(g, 0L), n))
    if (grams.exists(g => gramDf.getOrElse(g, 0L) == 0L)) return Nil
    val re = java.util.regex.Pattern.compile(
      if (caseSensitive) pattern
      else "(?i)" + pattern)
    val hits = docs.flatMap { d =>
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
    topK(hits, k)
  }
}
