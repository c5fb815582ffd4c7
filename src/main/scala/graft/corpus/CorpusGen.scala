package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus — the engine's input table,
  * shaped exactly per BASELINE.json.input_hint:
  *   corpus(repo STRING, path STRING, commit STRING, lang STRING,
  *          content STRING)  + derived contentSha = sha2(content, 256).
  *
  * Mirrors what bloop's GitWalker extracts from repositories (reference:
  * server/bleep/src/repo/iterator/git.rs:109-146) without any git machinery.
  * Token frequencies are Zipf-distributed with forced hot terms
  * `if`/`return`/`import` at the head — the skew targets named in
  * BASELINE.json.north_star. File sizes are log-normal, clipped at the
  * reference's indexability limits (≤20 000 lines / ≤600 000 bytes,
  * server/bleep/src/repo/iterator.rs:21-23).
  *
  * Fully deterministic from (seed, repo-index, file-index): every row is a
  * pure function of its global index, so the same (nRepos, filesPerRepo,
  * seed) yields byte-identical content at ANY parallelism level — the
  * per-row sha256 invariant and N-vs-4N scaling runs depend on this.
  * Generation is distributed: `spark.range` partitions the index space.
  */
object CorpusGen {

  val Langs: Array[String] = Array("rust", "python", "typescript", "go", "java")
  private val Exts = Map("rust" -> "rs", "python" -> "py",
    "typescript" -> "ts", "go" -> "go", "java" -> "java")

  /** Vocabulary: hot keywords first (Zipf head), then keywords, then
    * generated camelCase / snake_case identifiers. ~2000 terms.
    */
  val Vocab: Array[String] = {
    val hot = Array("if", "return", "import")
    val kw = Array("fn", "let", "mut", "pub", "struct", "impl", "match",
      "else", "for", "while", "def", "class", "self", "none", "true",
      "false", "const", "var", "function", "export", "interface", "type",
      "async", "await", "package", "func", "range", "chan", "public",
      "private", "static", "void", "int", "string", "new", "this", "try",
      "catch", "throw", "final", "extends", "implements", "super", "null")
    val roots = Array("parse", "index", "query", "search", "token", "score",
      "doc", "term", "block", "merge", "read", "write", "build", "cache",
      "repo", "path", "file", "line", "byte", "hash", "tree", "node",
      "graph", "scope", "branch", "commit", "error", "result", "option",
      "value", "key", "map", "list", "set", "vec", "buf", "stream", "chunk",
      "field", "norm", "freq", "rank", "http", "response", "request",
      "client", "server", "config", "state", "handle", "worker", "task",
      "sync", "lock", "pool", "span", "meta", "util", "test", "mock", "data")
    val suffix = Array("er", "ed", "ing", "s", "id", "ctx", "impl", "fmt")
    val camel = for (a <- roots; b <- roots.take(24) if a != b)
      yield a + b.capitalize
    val snake = for (a <- roots.take(30); s <- suffix) yield a + "_" + s
    (hot ++ kw ++ roots ++ camel.take(1400) ++ snake).distinct
  }

  /** Zipf(s=1.07) cumulative distribution over Vocab ranks. */
  private val ZipfCdf: Array[Double] = {
    val s = 1.07
    val w = Array.tabulate(Vocab.length)(i => 1.0 / math.pow(i + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def sampleToken(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    var lo = 0; var hi = ZipfCdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ZipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    Vocab(lo)
  }

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Metadata fields of a row WITHOUT generating its content: replays
    * exactly the rng draws genRow makes before content (lang, path token)
    * so the two faces can never diverge. The docId-rank bucket-count job
    * only needs (repo, path, commit) — generating content for it was a
    * full second generation pass per build (r6, guide §2.3 "project
    * before the exchange": a typed map is opaque to column pruning, so
    * content is now a separately prunable column).
    */
  def genMeta(seed: Long, nRepos: Int, filesPerRepo: Int, idx: Long)
      : (Long, String, String, String, String) = {
    val repoIdx = (idx / filesPerRepo).toInt
    val fileIdx = (idx % filesPerRepo).toInt
    val rng = new java.util.Random(seed * 0x9e3779b97f4a7c15L + idx * 0xc2b2ae3d27d4eb4fL + 1)
    val repo = s"github.com/org${repoIdx % 97}/repo$repoIdx"
    val lang = Langs(rng.nextInt(Langs.length))
    val path = s"src/mod${fileIdx % 13}/f${fileIdx}_${sampleToken(rng)}.${Exts(lang)}"
    val commit = sha256Hex(s"commit:$seed:$repo").take(40)
    (idx, repo, path, commit, lang)
  }

  /** Pure row generator: global file index → corpus row fields. */
  def genRow(seed: Long, nRepos: Int, filesPerRepo: Int, idx: Long)
      : (String, String, String, String, String) = {
    val repoIdx = (idx / filesPerRepo).toInt
    val fileIdx = (idx % filesPerRepo).toInt
    val rng = new java.util.Random(seed * 0x9e3779b97f4a7c15L + idx * 0xc2b2ae3d27d4eb4fL + 1)
    val repo = s"github.com/org${repoIdx % 97}/repo$repoIdx"
    val lang = Langs(rng.nextInt(Langs.length))
    val path = s"src/mod${fileIdx % 13}/f${fileIdx}_${sampleToken(rng)}.${Exts(lang)}"
    val commit = sha256Hex(s"commit:$seed:$repo").take(40)
    // log-normal line count, clipped to reference limits
    val rawLines = math.exp(3.0 + 1.0 * rng.nextGaussian())
    val nLines = math.max(3, math.min(rawLines.toInt, 20000))
    val sb = new StringBuilder
    var l = 0
    while (l < nLines && sb.length < 590000) {
      val nTok = 4 + rng.nextInt(8)
      var t = 0
      sb.append("  " * rng.nextInt(3))
      while (t < nTok) {
        sb.append(sampleToken(rng))
        sb.append(if (t == nTok - 1) "" else if (rng.nextInt(7) == 0) "(" else " ")
        t += 1
      }
      sb.append(if (rng.nextInt(5) == 0) " {" else "")
      sb.append('\n')
      l += 1
    }
    (repo, path, commit, lang, sb.toString)
  }

  /** Distributed corpus table. Deterministic for fixed (nRepos,
    * filesPerRepo, seed) at any parallelism. Metadata comes from the
    * cheap typed map; content (and its sha) is a DETERMINISTIC
    * per-row-generated column that Catalyst PRUNES when a consumer only
    * reads metadata — the builder's bucket-count job was paying a full
    * content-generation pass it never read (byte-identical: the content
    * expression replays genRow on the same index).
    */
  def synth(spark: SparkSession, nRepos: Int, filesPerRepo: Int,
            seed: Long = 42L, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val total = nRepos.toLong * filesPerRepo
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val contentOf = udf((idx: Long) =>
      CorpusGen.genRow(seed, nRepos, filesPerRepo, idx)._5)
    spark.range(0, total, 1, parts)
      .map { idx =>
        CorpusGen.genMeta(seed, nRepos, filesPerRepo, idx)
      }
      .toDF("idx", "repo", "path", "commit", "lang")
      .withColumn("content", contentOf($"idx"))
      .withColumn("contentSha", sha2($"content", 256))
      .select("repo", "path", "commit", "lang", "content", "contentSha")
  }
}
