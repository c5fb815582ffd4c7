package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{FuzzyPath, Searcher}
import graft.index.IndexBuilder
import graft.pipeline.{Dedup, Multimodal, Similarity, TextOps}

/** Driver contract (builder prompt + SURVEY.md §7.1 item 7).
  *
  * Two query families:
  *   - `q_*`: SQL-expressible operator analogs over the driver's parquet
  *     tables, each with an exact DuckDB oracle in `oracleSql` (the
  *     correctness gate). They cover the reference's collector/filter/
  *     boolean surface (SURVEY §2.6/2.7) plus the training-data pipeline
  *     ops (dedup, similarity, text analysis).
  *   - `e_*`: the search engine itself (index build + BM25 top-k + regex)
  *     over a corpus derived from the documents table — not expressible in
  *     DuckDB SQL (rows-only check here; rank-identity vs the in-repo
  *     oracle is enforced by `sbt -batch test`, EngineSpec).
  */
object SparkEntry {

  /** documents table → the input_hint corpus shape (schema-validated
    * through the same contract every source — incl. the production
    * Iceberg reader, `sources.CorpusSource.iceberg` — goes through).
    */
  def corpusFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.CorpusSource.fromDocuments(spark, sfDir)

  /** Build (or resume) the inverted index for a corpus dir; cached across
    * queries of one Verify/Bench run via the `_SUCCESS` resume markers.
    */
  def indexFor(spark: SparkSession, sfDir: String): Searcher = {
    val root = s"/tmp/graft-index-${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    new IndexBuilder(spark, root, bucketSize = 1024).build(
      corpusFromDocuments(spark, sfDir))
    new Searcher(spark, root)
  }

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Data-mixing demo rates for q_sample — ONE definition shared by the
    * engine call and the SQL oracle so the mixture can never drift.
    */
  val SampleRates: Map[String, Double] =
    Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25)
  val SampleDefault: Double = 0.1
  // q_pack / q_vocab tuning literals — one definition for the engine call
  // AND the oracle SQL (same no-drift rule as SampleRates)
  val PackBudget = 64
  val PackShardSize = 32
  val VocabK = 200
  // unigram-LM demo vocab size: the sf corpus has ~31 distinct words, so
  // 20 leaves a real OOV tail (vocabSize ≥ vocab would make n_oov
  // vacuously 0 and never exercise the miss path)
  val UnigramV = 20

  /** Flagship: end-to-end index build + conjunctive BM25 top-k on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val s = indexFor(spark, "/root/testdata/sf0.001")
    s.materialize(s.searchLiteral("merge join", 10))
      .select("docId", "score", "repo", "path", "lang")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- collectors / filters / boolean ops over documents (SURVEY §2.6-2.7)
    "q_count" -> ((s, d) => docs(s, d).agg(count("*").as("n"))),
    "q_lang_freq" -> ((s, d) => // C4 FrequencyCollector
      docs(s, d).groupBy("lang").agg(count("*").as("cnt"))),
    "q_topk_len" -> ((s, d) => // C1 TopDocs: top-k with explicit tie-break
      docs(s, d).select("doc_id", "n_chars")
        .orderBy(col("n_chars").desc, col("doc_id").asc).limit(100)),
    "q_topk_offset" -> ((s, d) => // C1 pagination: and_offset semantics
      docs(s, d).select("doc_id", "n_chars")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .offset(25).limit(50)),
    "q_group_cap" -> ((s, d) => { // C6 GroupCollector: top-3 per group
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      docs(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("doc_id", "lang", "n_chars", "rn")
    }),
    "q_regex_verify" -> ((s, d) => // C5 BytesFilterCollector: regex verify
      docs(s, d).filter(regexp_like(col("text"), lit("merge (join|sort)")))
        .select("doc_id")),
    "q_filter_indexable" -> ((s, d) => // S4 file filters
      docs(s, d).filter(col("n_chars") <= 300 && col("lang").isin("en", "de"))
        .select("doc_id", "lang", "n_chars")),
    // ---- index-build analogs
    "q_token_count" -> ((s, d) => TextOps.tokenCounts(docs(s, d))),
    "q_term_df" -> ((s, d) => TextOps.termDf(docs(s, d))),
    "q_bm25_topk" -> ((s, d) => bm25Sql(docs(s, d), "merge", "join", 50)),
    // ---- dedup family
    "q_exact_dedup" -> ((s, d) => TextOps.exactDedup(docs(s, d))),
    "q_fingerprint" -> ((s, d) => TextOps.fingerprint(docs(s, d))),
    "q_minhash_bands" -> ((s, d) => Dedup.minhashBands(docs(s, d))),
    "q_simhash" -> ((s, d) => Dedup.simhash(docs(s, d))),
    "q_minhash_pairs" -> ((s, d) => Dedup.minhashCandidates(docs(s, d))),
    "q_simhash_pairs" -> ((s, d) => // Hamming-band LSH + exact bit_count
      // verify — complete recall for Hamming ≤ 3 by pigeonhole
      Dedup.simhashPairs(docs(s, d))),
    "q_dedup_clusters" -> ((s, d) => // connected components over LSH
      // buckets via star-reduced edges (same components as the full
      // clique pairs — the oracle computes them from the cliques)
      Dedup.duplicateClusters(Dedup.minhashStarEdges(docs(s, d)))),
    "q_jaccard_pairs" -> ((s, d) => Dedup.jaccardConsecutive(docs(s, d))),
    "q_jaccard_lsh" -> ((s, d) => // LSH candidates + exact-Jaccard verify —
      // the production near-dup path (bucketed candidates, true similarity)
      Dedup.jaccardVerifiedPairs(docs(s, d), threshold = 0.5)),
    // ---- text analysis
    "q_chunks" -> ((s, d) => // token-budget chunking w/ overlap (chunk.rs
      // analog; small budget so the small-SF docs split into several
      // chunks — production default is 256/64)
      TextOps.chunks(docs(s, d), budget = 16, overlap = 4)),
    "q_pii_scrub" -> ((s, d) => // PII redaction over a derived corpus with
      // deterministically injected e-mail / IPv4 / id-number strings (the
      // synthetic text carries none) — both engines derive the same rows
      TextOps.piiScrub(docs(s, d).select(col("doc_id"),
        concat(col("text"), lit(" user"), col("doc_id"),
          lit("@mail.example.com from 10.0."), col("doc_id") % 256,
          lit(".7 id 123456"), col("doc_id")).as("text")))),
    "q_repetition" -> ((s, d) => TextOps.repetitionRatio(docs(s, d))),
    "q_vocab" -> ((s, d) => // BPE-pre-token frequency table, top-K —
      // the tokenizer-training counting stage (deterministic tiebreak)
      TextOps.vocab(docs(s, d), k = VocabK)),
    "q_sample" -> ((s, d) => // deterministic stratified sampling — the
      // data-mixing stage; per-language keep rates, hash-portable
      TextOps.stratifiedSample(docs(s, d), SampleRates, SampleDefault)),
    "q_pack" -> ((s, d) => // sharded sequence packing: where each doc
      // lands (shard, seq index, token offset) when concatenated into
      // fixed-budget training sequences
      TextOps.packSequences(docs(s, d), budget = PackBudget,
        shardSize = PackShardSize)),
    "q_dedup_keep" -> ((s, d) => // terminal dedup stage: the corpus that
      // survives near-dup clustering (drop non-representative members)
      Dedup.keepAfterClustering(docs(s, d),
        Dedup.duplicateClusters(Dedup.minhashStarEdges(docs(s, d))))
        .select("doc_id", "lang", "n_chars")),
    "q_dedup_firstwins" -> ((s, d) => // order-based dedup policy: first
      // (lowest-id) occurrence survives any shared LSH bucket — the
      // batch twin of streaming dedup (StreamingDedup, stream==batch)
      Dedup.firstWinsKeep(docs(s, d)).select("doc_id", "lang", "n_chars")),
    "q_decontaminate" -> ((s, d) => { // 13-gram benchmark-overlap filter;
      // the "benchmark" is derived deterministically from the corpus
      // itself (TextOps.derivedEvalSet), so both engines build the
      // identical eval set with no external data
      val dd = docs(s, d)
      TextOps.decontaminate(dd, TextOps.derivedEvalSet(dd))
    }),
    "q_unigram_lm" -> ((s, d) => // unigram-LM quality score: train a
      // top-V ppm table from the corpus, score docs by mean in-vocab
      // token probability (integer ppm — engine-portable, no ln())
      TextOps.unigramScore(docs(s, d), vocabSize = UnigramV)),
    "q_mixing" -> ((s, d) => // temperature-scaled (α = 1/2) domain-mixing
      // weights per language — the multinomial-sampling stage; sqrt is
      // the one IEEE-correctly-rounded power, so both engines agree
      TextOps.mixingWeights(docs(s, d))),
    "q_quality_buckets" -> ((s, d) => // CCNet head/middle/tail tiers:
      // sharded ntile over the unigram-LM score (score desc, doc_id asc
      // — deterministic; shard-bounded window, never a global order)
      TextOps.qualityBuckets(docs(s, d), nBuckets = 3,
        shardSize = PackShardSize, vocabSize = UnigramV)),
    "q_dsir" -> ((s, d) => { // DSIR importance weights: mean per-word ppm
      // gap between a target-domain unigram table (every 7th doc — the
      // deterministic stand-in, like q_decontaminate's eval set) and the
      // corpus table; integer ppm difference instead of log-ratio keeps
      // both engines exact
      val dd = docs(s, d)
      TextOps.importanceWeights(dd, TextOps.derivedTargetSet(dd),
        vocabSize = UnigramV)
    }),
    "q_span_dedup" -> ((s, d) => // cross-document repeated 13-gram spans
      // (exact-substring dedup signal à la suffix-array training dedup)
      TextOps.spanDedupStats(docs(s, d))),
    "q_span_removal" -> ((s, d) => // the terminal span-dedup TRANSFORM:
      // drop every word covered by a cross-document duplicated 13-gram,
      // keep the rest (Lee et al. policy; every doc survives)
      TextOps.removeDuplicateSpans(docs(s, d))),
    "q_langid" -> ((s, d) => TextOps.langIdScore(docs(s, d))),
    "q_quality" -> ((s, d) => TextOps.qualityScore(docs(s, d))),
    "q_stopword_filter" -> ((s, d) => TextOps.stopwordFiltered(docs(s, d))),
    // ---- similarity search
    "q_cosine_topk" -> ((s, d) => Similarity.cosineTopK(emb(s, d), 0L, 20)),
    "q_cosine_neardup" -> ((s, d) =>
      Similarity.cosineNearDupConsecutive(emb(s, d), 0.15)),
    "q_cosine_neardup_lsh" -> ((s, d) => // LSH-bucketed candidates + exact
      // cosine verify — embedding near-dup at scale (no all-pairs)
      Similarity.cosineNearDupLsh(emb(s, d), 0.15)),
    // ---- join zoo on the TPC-H-ish tables (B2/B3 semi/anti analogs)
    "q_semi_join" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val li = s.read.parquet(s"$d/lineitem.parquet")
        .filter(col("l_quantity") > 45)
      o.join(li.select(col("l_orderkey").as("o_orderkey")).distinct(),
        Seq("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")
    }),
    "q_anti_join" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val li = s.read.parquet(s"$d/lineitem.parquet")
      o.join(li.select(col("l_orderkey").as("o_orderkey")).distinct(),
        Seq("o_orderkey"), "left_anti")
        .select("o_orderkey")
    }),
    "q_join_agg" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val li = s.read.parquet(s"$d/lineitem.parquet")
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count("*").as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
    }),
    "q_event_sessions" -> ((s, d) => { // sessionization (gap > 30 min)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      s.read.parquet(s"$d/events.parquet")
        .withColumn("prev_ts", lag(unix_timestamp(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - col("prev_ts") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count("*").as("n_events"),
          min(unix_timestamp(col("ts"))).as("start_s"))
    }),
    "q_event_windows" -> ((s, d) => // the Structured Streaming operator's
      // batch face (withWatermark is a no-op on batch; StreamingSpec
      // proves stream == batch on the same plan)
      graft.streaming.StreamingOps.windowedEventCounts(
        s.read.parquet(s"$d/events.parquet"))),
    "q_window_events" -> ((s, d) =>
      s.read.parquet(s"$d/events.parquet")
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600).as("hour_bucket"))
        .agg(count("*").as("n"),
          round(min("value"), 4).as("min_v"),
          round(max("value"), 4).as("max_v"))),
    // ---- engine queries. Every e_* row has a DuckDB oracle (round-1
    // VERDICT item 1): docIds mirror via the sha256 rank (withDocIds is
    // order-preserving in the docKey hex string), the documents text is
    // single-spaced lowercase words so code tokens == string_split words,
    // and f32-ranked outputs are either exported as FULL match sets
    // (k ≥ corpus, set equality is precision-free) or re-scored through
    // the double-precision witness (searchDoubleWitness). f32 rank
    // identity itself stays enforced by the sbt suite (EngineSpec).
    "e_docid_map" -> ((s, d) => // withDocIds global rank, end to end
      indexFor(s, d).docs.select("docId", "repo", "path", "commit", "lang")),
    "e_index_search" -> ((s, d) => { // WAND conjunctive, full match set
      val se = indexFor(s, d)
      se.materialize(se.searchLiteral("merge join", AllK))
        .select("docId", "repo", "path")
    }),
    "e_index_topk_double" -> ((s, d) => // BM25 through the index artifacts
      indexFor(s, d).searchDoubleWitness("merge", "join", 50)),
    "e_index_wand_or" -> ((s, d) => { // WAND OR, full match set
      val se = indexFor(s, d)
      se.search(Seq("vector", "stream", "window"), AllK,
        conjunctive = false, useWand = true).toDF()
        .join(se.docs.select("docId", "repo", "path"), "docId")
        .select("docId", "repo", "path")
    }),
    "e_index_regex" -> ((s, d) => // two-phase regex, full verified set
      indexFor(s, d).regexAll("merge (join|sort)")
        .select("docId", "repo", "path")),
    "e_tweaked_search" -> ((s, d) => // DocumentTweaker, double witness
      indexFor(s, d).searchDoubleWitness("merge", "join", 50,
        tweakedNow = Some(1700000000L))),
    "e_lang_stats" -> ((s, d) => { // C4 FrequencyCollector THROUGH the
      // one-pass page face (C7 MultiCollector): the histogram comes from
      // executePage's single cached candidate pass, full hit set
      import s.implicits._
      val se = indexFor(s, d)
      new graft.engine.QueryExecutor(se).executePage("merge", 10)
        .langStats.toDF("lang", "count")
    }),
    "e_query_language" -> ((s, d) => { // parse→DNF→branch union, full set
      val se = indexFor(s, d)
      new graft.engine.QueryExecutor(se)
        .execute("(lang:en or lang:de) merge join", AllK).toDF()
        .join(se.docs.select("docId", "repo", "path", "lang"), "docId")
        .select("docId", "repo", "path", "lang")
    }),
    "e_path_search" -> ((s, d) => { // scored path field ∧ content, full set
      val se = indexFor(s, d)
      new graft.engine.QueryExecutor(se)
        .execute("path:oc/1 merge", AllK).toDF()
        .join(se.docs.select("docId", "repo", "path"), "docId")
        .select("docId", "repo", "path")
    }),
    "e_path_highlight" -> ((s, d) => // path highlight ranges on FILE hits
      // (executeAny file rows carry the path-pattern highlight column)
      new graft.engine.QueryExecutor(indexFor(s, d))
        .executeAny("path:oc/1 merge", AllK)
        .select(col("path"), size(col("highlights")).as("n_highlights"))),
    "e_symbol_search" -> ((s, d) => { // "s:" namespace over derived code
      val se = codeIndexFor(s, d)
      new graft.engine.QueryExecutor(se)
        .execute("symbol:merge", AllK).toDF()
        .join(se.docs.select("docId", "repo", "path"), "docId")
        .select("repo", "path")
    }),
    "e_open_listing" -> ((s, d) => // D6 dir documents / OpenReader
      new graft.engine.QueryExecutor(indexFor(s, d))
        .executeOpen("open:true repo:src2 path:doc/")),
    "e_fuzzy_path" -> ((s, d) => {
      import s.implicits._
      FuzzyPath.search(indexFor(s, d), "doc1", 20)
        .toDF("docId", "path", "repo", "fuzzy_score")
    }),
    "e_snippets" -> ((s, d) => { // Snipper over every regex match
      import s.implicits._
      val rows = indexFor(s, d).regexAll("merge\\s+join")
        .select($"docId", $"repo", $"path", $"content", $"lineEnds")
        .collect()
      rows.map { r =>
        val snips = graft.engine.Snippets.forDoc(r.getString(3),
          r.getSeq[Int](4).toArray, "merge\\s+join")
        (r.getLong(0), r.getString(1), r.getString(2), snips.size,
          snips.map(_.highlights.size).sum,
          snips.headOption.map(_.data.take(60)).getOrElse(""))
      }.toSeq.toDF("docId", "repo", "path", "n_snippets", "n_highlights",
        "first_snippet")
    }),
    "e_symbol_snippets" -> ((s, d) => { // symbol-mode Snipper: highlights
      // intersected with symbol-definition ranges (snippet.rs:144-205)
      import s.implicits._
      val se = codeIndexFor(s, d)
      val rows = new graft.engine.QueryExecutor(se)
        .execute("symbol:merge", AllK).toDF()
        .join(se.docs.select("docId", "repo", "path", "content", "lineEnds"),
          "docId")
        .select($"repo", $"path", $"content", $"lineEnds").collect()
      rows.map { r =>
        val snips = graft.engine.Snippets.forDocSymbols(r.getString(2),
          r.getSeq[Int](3).toArray, "merge")
        (r.getString(0), r.getString(1), snips.size,
          snips.map(_.highlights.size).sum,
          snips.headOption.map(_.data).getOrElse(""))
      }.toSeq.toDF("repo", "path", "n_snippets", "n_highlights",
        "first_snippet")
    }),
    "e_incremental" -> ((s, d) => {
      // base on the first half, ingest the second in TWO delta batches,
      // delete one source repo, fold the deltas with the tiered merge
      // (docIds preserved — the oracle row is unchanged by construction),
      // then search across generations with tombstone-aware WAND
      // (D2 + S8 + the LSM maintenance path)
      val all = corpusFromDocuments(s, d)
      val root = s"/tmp/graft-inc-${d.replaceAll("[^a-zA-Z0-9.]", "_")}"
      Bench.freshDir(root)
      val inc = new graft.index.IncrementalIndexer(s, root, bucketSize = 1024)
      inc.buildBase(all.filter(col("path") < lit("doc/3")))
      inc.ingest(all.filter(col("path") >= lit("doc/3") &&
        col("path") < lit("doc/6")))
      inc.ingest(all.filter(col("path") >= lit("doc/6")))
      inc.deleteRepo("src0")
      inc.mergeDeltas()
      val ms = inc.searcher()
      ms.materialize(ms.search(ms.queryTerms("merge join"), AllK,
        conjunctive = true, useWand = true))
        .select("repo", "path")
    }),
    "e_repo_search" -> ((s, d) => // RepoReader: repo-name sub-index, full
      // verified name set (scored literal branch OR regex branch)
      new graft.engine.QueryExecutor(indexFor(s, d))
        .executeRepo("repo:rc1 or repo:/src1[0-9]/", AllK)
        .select("name")),
    "e_org_repo_search" -> ((s, d) => // org-qualified RepoReader search
      // over an org-structured corpus (owner-segment filter + scored name)
      new graft.engine.QueryExecutor(orgIndexFor(s, d))
        .executeRepo("org:acme repo:rc1", AllK)
        .select("name")),
    "e_case_search" -> ((s, d) => // exact-case "c:" namespace scoring
      // (case:sensitive parity) through the double-precision witness over
      // a mixed-case derived corpus — capitalized first words carry
      // different df/tf than their lowercase twins
      caseIndexFor(s, d).searchDoubleWitness("c:Merge", "c:join", 50)),
    "e_lsh_topk" -> ((s, d) => Similarity.lshTopK(emb(s, d), 0L, 10)),
    "e_ivf_topk" -> ((s, d) => { // train-once artifacts + indexed query —
      // the production IVF shape (round-3 VERDICT: no per-query retrain)
      val dir = s"/tmp/graft-ivf-${d.replaceAll("[^a-zA-Z0-9.]", "_")}"
      Similarity.buildIvfIndex(emb(s, d), dir)
      Similarity.ivfTopKIndexed(emb(s, d), dir, 0L, 10)
    }),
    "e_media_features" -> ((s, _) =>
      Multimodal.featureStats(Multimodal.synthMedia(s, 300))),
    "e_frame_sample" -> ((s, _) =>
      Multimodal.frameSample(Multimodal.synthMedia(s, 300), 4)
        .select(col("media_id"), size(col("frame_indices")).as("n_sampled"))),
  )

  /** k larger than any small-SF corpus: turns a top-k query into its full
    * match set, which is comparable by set equality (no f32 boundary).
    */
  private val AllK = 1000000

  /** Derived code corpus with SQL-mirrorable symbol definitions: one `fn
    * <firstword>_run()` per document row — real SymbolExtractor + "s:"
    * indexing on the Spark side, `split_part(text,' ',1)` on the oracle
    * side.
    */
  private def codeCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("source").as("repo"),
      concat(lit("code/"), col("doc_id")).as("path"),
      lit("main").as("commit"),
      col("lang"),
      concat(lit("fn "), split_part(col("text"), lit(" "), lit(1)),
        lit("_run() { return 0 }")).as("content"))

  private def codeIndexFor(s: SparkSession, d: String): Searcher = {
    val root = s"/tmp/graft-codeidx-${d.replaceAll("[^a-zA-Z0-9.]", "_")}"
    new IndexBuilder(s, root, bucketSize = 1024).build(codeCorpus(s, d))
    new Searcher(s, root)
  }

  /** Derived MIXED-CASE corpus: even doc_ids capitalize their first
    * character, so exact-case term statistics ("c:Merge" vs "c:merge")
    * genuinely differ from the lowercased ones — the case:sensitive
    * scoring-parity witness corpus (format v10).
    */
  private def caseCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("source").as("repo"),
      concat(lit("case/"), col("doc_id")).as("path"),
      lit("main").as("commit"),
      col("lang"),
      when(col("doc_id") % 2 === 0,
        concat(upper(substring(col("text"), 1, 1)), expr("substring(text, 2)")))
        .otherwise(col("text")).as("content"))

  private def caseIndexFor(s: SparkSession, d: String): Searcher = {
    val root = s"/tmp/graft-caseidx-${d.replaceAll("[^a-zA-Z0-9.]", "_")}"
    new IndexBuilder(s, root, bucketSize = 1024).build(caseCorpus(s, d))
    new Searcher(s, root)
  }

  /** Derived corpus whose repo names carry an owner segment
    * ("acme/srcN" / "beta/srcN"), exercising org-qualified repo search.
    */
  private def orgCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      concat(when(col("doc_id") % 2 === 0, lit("acme/"))
        .otherwise(lit("beta/")), col("source")).as("repo"),
      concat(lit("doc/"), col("doc_id")).as("path"),
      lit("main").as("commit"),
      col("lang"),
      col("text").as("content"))

  private def orgIndexFor(s: SparkSession, d: String): Searcher = {
    val root = s"/tmp/graft-orgidx-${d.replaceAll("[^a-zA-Z0-9.]", "_")}"
    new IndexBuilder(s, root, bucketSize = 1024).build(orgCorpus(s, d))
    new Searcher(s, root)
  }

  /** SQL-parity BM25 (double precision, quantization-free): an independent
    * DuckDB-checkable witness of the scoring math. Conjunctive two-term
    * query; per-term scores added explicitly (no SUM over rows) so double
    * addition order is fixed on both engines.
    */
  private def bm25Sql(documents: DataFrame, t1: String, t2: String,
                      k: Int): DataFrame = {
    val w = documents.select(col("doc_id"),
      explode(TextOps.words(col("text"))).as("w"))
    val lens = w.groupBy("doc_id").agg(count("*").as("dl"))
    val stats = lens.agg(count("*").as("n"), avg("dl").as("avgdl"))
    val tf = w.groupBy("doc_id", "w").agg(count("*").as("tf"))
    def side(t: String, tfn: String) =
      tf.filter(col("w") === t).select(col("doc_id"), col("tf").as(tfn))
    def dfOf(t: String, dfn: String) =
      tf.filter(col("w") === t).agg(count("*").as(dfn))
    def score(tfc: String, dfc: String) =
      log(lit(1.0) + (col("n") - col(dfc) + 0.5) / (col(dfc) + 0.5)) *
        2.2 * col(tfc) /
        (col(tfc) + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    side(t1, "tf1").join(side(t2, "tf2"), "doc_id")
      .join(lens, "doc_id")
      .crossJoin(stats).crossJoin(dfOf(t1, "df1")).crossJoin(dfOf(t2, "df2"))
      .select(col("doc_id"),
        round(score("tf1", "df1") + score("tf2", "df2"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** DuckDB equivalents, same column names and value spec. */
  def oracleSql: Map[String, String] = {
    val words =
      "SELECT doc_id, w FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) WHERE w <> ''"
    val charHash = (v: String) => TextOps.charHashSql(v)
    // the 13-gram CTE building blocks — ONE definition across the gram
    // oracles (q_decontaminate, q_span_dedup, q_span_removal): BOTH hash
    // channels (word folds and the two large-prime gram folds) must never
    // drift from the Spark-side wordHashes/wordHashes2 + gramHashes/
    // gramHashes2 polynomials; grams match only on (g1, g2) agreement
    val wordHash13a = TextOps.charHashSql("w")
    val wordHash13b = TextOps.charHash2Sql("w")
    val gramFold13a = "list_reduce(list_prepend(0::BIGINT, wh1[i:i+12]), " +
      s"(a,h) -> (a*31+h) % ${TextOps.GramP1})"
    val gramFold13b = "list_reduce(list_prepend(0::BIGINT, wh2[i:i+12]), " +
      s"(a,h) -> (a*37+h) % ${TextOps.GramP2})"
    // shared wh CTE body: both word-hash channels of the documents table
    val whCte13 =
      s"""(SELECT doc_id,
         |    list_transform(list_filter(string_split(text,' '),
         |      w -> w <> ''), w -> $wordHash13a) AS wh1,
         |    list_transform(list_filter(string_split(text,' '),
         |      w -> w <> ''), w -> $wordHash13b) AS wh2
         |  FROM documents)""".stripMargin
    // docId mirror of IndexBuilder.withDocIds: the rank bucket is a
    // MONOTONE function of the docKey's first 8 hex chars, so the global
    // (bucket, docKey) order equals plain docKey hex order — one
    // row_number over sha256(repo ∥ NUL ∥ path ∥ NUL ∥ commit).
    val ids =
      """corpus AS (
        |  SELECT source AS repo, 'doc/' || doc_id AS path,
        |         substr(sha256(text),1,40) AS cmt, lang, text AS content,
        |         n_chars
        |  FROM documents),
        |ids AS (
        |  SELECT CAST(row_number() OVER (
        |           ORDER BY sha256(repo || chr(0) || path || chr(0) || cmt))
        |         AS BIGINT) AS "docId",
        |         repo, path, cmt, lang, content, n_chars
        |  FROM corpus)""".stripMargin
    // the documents text is single-spaced lowercase words: code tokens ==
    // string_split words (checked by EngineSpec's tokenizer-parity test)
    val idWords =
      s"""$ids,
         |idw AS (SELECT "docId", w FROM (
         |    SELECT "docId", unnest(string_split(content,' ')) AS w FROM ids)
         |  WHERE w <> '')""".stripMargin
    val mergeJoin =
      """,
        |mm AS (SELECT "docId" FROM idw WHERE w IN ('merge','join')
        |       GROUP BY "docId" HAVING count(DISTINCT w) = 2)""".stripMargin
    // shared double-BM25 witness CTE chain (mirror of searchDoubleWitness)
    val bmw =
      s"""$idWords,
         |lens AS (SELECT "docId", count(*) AS dl FROM idw GROUP BY "docId"),
         |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM lens),
         |tf AS (SELECT "docId", w, count(*) AS tf FROM idw GROUP BY "docId", w),
         |s1 AS (SELECT "docId", tf AS tf1 FROM tf WHERE w = 'merge'),
         |s2 AS (SELECT "docId", tf AS tf2 FROM tf WHERE w = 'join'),
         |d1 AS (SELECT count(*) AS df1 FROM s1),
         |d2 AS (SELECT count(*) AS df2 FROM s2)""".stripMargin
    val bmwScore =
      """ln(1.0 + (n - df1 + 0.5)/(df1 + 0.5)) * 2.2 * tf1 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl)) +
        |  ln(1.0 + (n - df2 + 0.5)/(df2 + 0.5)) * 2.2 * tf2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl))""".stripMargin
    val bmwFrom =
      """FROM s1 JOIN s2 USING ("docId") JOIN lens USING ("docId") JOIN ids i USING ("docId")
        |CROSS JOIN stats CROSS JOIN d1 CROSS JOIN d2""".stripMargin
    // The MinHash wh/mh/bands CTE block — ONE definition for every LSH
    // oracle (q_minhash_pairs, q_jaccard_lsh, q_dedup_clusters/keep,
    // q_dedup_firstwins): the hash family and band construction must
    // never drift between them and the Spark side.
    val lshBandsCte = (wordsSel: String) =>
      s"""wh AS (SELECT DISTINCT doc_id, ${charHash("w")} AS wh FROM ($wordsSel)),
         |mh AS (SELECT doc_id, seed, min(((2*seed+1)*wh + (1000003*seed+12345)) % 1000000007) AS minhash
         |       FROM wh CROSS JOIN (SELECT unnest(range(0,12)) AS seed) GROUP BY doc_id, seed),
         |bands AS (SELECT doc_id, CAST(seed // 3 AS INT) AS band,
         |            string_agg(minhash, ',' ORDER BY seed) AS sig
         |          FROM mh GROUP BY doc_id, seed // 3)""".stripMargin
    // Shared by q_dedup_clusters and q_dedup_keep: MinHash bands → LSH
    // clique pairs → symmetric edges → recursive-CTE reachability →
    // min-label components (the oracle computes the same components the
    // engine's star-reduced pointer-jumping CC computes).
    val dedupClustersSql = (wordsSel: String) =>
      s"WITH RECURSIVE ${lshBandsCte(wordsSel)},\n" +
      """pairs AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
         |            AND a.doc_id < b.doc_id),
         |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
         |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin
    Map(
      "q_count" -> "SELECT count(*) AS n FROM documents",
      "q_lang_freq" ->
        "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
      "q_topk_len" ->
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100",
      "q_topk_offset" ->
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 50 OFFSET 25",
      "q_group_cap" ->
        """SELECT doc_id, lang, n_chars, rn FROM (
          |  SELECT doc_id, lang, n_chars, CAST(row_number() OVER (
          |    PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS rn
          |  FROM documents) WHERE rn <= 3""".stripMargin,
      "q_regex_verify" ->
        "SELECT doc_id FROM documents WHERE regexp_matches(text, 'merge (join|sort)')",
      "q_filter_indexable" ->
        "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars <= 300 AND lang IN ('en','de')",
      "q_token_count" ->
        s"""SELECT doc_id, count(*) AS n_words,
           |  CAST(ceil(any_value(n_chars)/4.0) AS BIGINT) AS n_bpe_est,
           |  CAST(any_value(len(regexp_extract_all(text, '${TextOps.BpeTokenRegex}', 0))) AS BIGINT) AS n_bpe_regex
           |FROM (SELECT doc_id, n_chars, text, unnest(string_split(text,' ')) AS w FROM documents)
           |WHERE w <> '' GROUP BY doc_id""".stripMargin,
      "q_term_df" ->
        s"SELECT w AS term, count(DISTINCT doc_id) AS df FROM ($words) GROUP BY w",
      "q_vocab" -> // mirror of TextOps.vocab(k=200): BPE-pre-token corpus
        // frequency table with the deterministic (freq desc, token asc)
        // tiebreak
        s"""SELECT token, count(*) AS freq
           |FROM (SELECT unnest(regexp_extract_all(text, '${TextOps.BpeTokenRegex}')) AS token
           |      FROM documents)
           |GROUP BY token ORDER BY freq DESC, token ASC LIMIT $VocabK""".stripMargin,
      "q_sample" -> // mirror of TextOps.stratifiedSample: two-round Knuth
        // multiplicative hash of doc_id vs per-language CASE thresholds
        s"""SELECT doc_id, lang, h FROM (
           |  SELECT doc_id, lang, ${TextOps.sampleHashSql("doc_id")} AS h
           |  FROM documents)
           |WHERE h < ${TextOps.sampleThresholdSql(SampleRates, SampleDefault)}""".stripMargin,
      "q_pack" -> // mirror of TextOps.packSequences at the shared
        // PackBudget/PackShardSize: sharded cumulative token counts ->
        // sequence index + offset
        s"""WITH t AS (SELECT doc_id, doc_id // $PackShardSize AS shard,
           |             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
           |           FROM documents),
           |c AS (SELECT doc_id, shard, n_tokens,
           |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |      FROM t)
           |SELECT doc_id, shard, cum_before // $PackBudget AS seq_id,
           |       cum_before % $PackBudget AS offset, n_tokens FROM c""".stripMargin,
      "q_bm25_topk" -> bm25OracleSql("merge", "join", 50),
      "q_exact_dedup" ->
        "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dupes FROM documents GROUP BY md5(text)",
      "q_fingerprint" ->
        s"SELECT doc_id, ${charHash("text")} AS fp FROM documents",
      "q_minhash_bands" ->
        s"""WITH wh AS (SELECT DISTINCT doc_id, ${charHash("w")} AS wh FROM ($words)),
           |mh AS (SELECT doc_id, seed, min(((2*seed+1)*wh + (1000003*seed+12345)) % 1000000007) AS minhash
           |       FROM wh CROSS JOIN (SELECT unnest(range(0,12)) AS seed) GROUP BY doc_id, seed)
           |SELECT doc_id, CAST(seed // 3 AS INT) AS band,
           |       string_agg(minhash, ',' ORDER BY seed) AS sig
           |FROM mh GROUP BY doc_id, seed // 3""".stripMargin,
      "q_simhash" ->
        s"""WITH tf AS (SELECT doc_id, w, count(*) AS tf FROM ($words) GROUP BY doc_id, w),
           |wh AS (SELECT doc_id, tf, ${charHash("w")} AS wh FROM tf),
           |votes AS (SELECT doc_id, bit, sum(tf * (((wh // CAST(pow(2,bit) AS BIGINT)) % 2)*2 - 1)) AS v
           |          FROM wh CROSS JOIN (SELECT unnest(range(0,16)) AS bit) GROUP BY doc_id, bit)
           |SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2,bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
           |FROM votes GROUP BY doc_id""".stripMargin,
      "q_minhash_pairs" ->
        (s"WITH ${lshBandsCte(words)}\n" +
          """SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
             |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
             |  AND a.doc_id < b.doc_id""".stripMargin),
      "q_simhash_pairs" -> // 64-bit banded SimHash (4×16-bit Manku bands):
        // Hamming LSH on exact band words + Σ bit_count(xor) verify
        // (mirrors Dedup.simhashPairs / simhash64Bands)
        s"""WITH tf AS (SELECT doc_id, w, count(*) AS tf FROM ($words) GROUP BY doc_id, w),
           |wh AS (SELECT doc_id, tf, ${charHash("w")} AS wh FROM tf),
           |votes AS (SELECT doc_id, bit, sum(tf * ((((wh*(bit*2+1) + (bit*1000003 + 12345)) % 1000000007) % 2)*2 - 1)) AS v
           |          FROM wh CROSS JOIN (SELECT unnest(range(0,64)) AS bit) GROUP BY doc_id, bit),
           |sb AS (SELECT doc_id, CAST(bit // 16 AS INT) AS band,
           |         CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, bit % 16) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
           |       FROM votes GROUP BY doc_id, bit // 16),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b
           |         FROM sb x JOIN sb y ON x.band = y.band AND x.bucket = y.bucket
           |           AND x.doc_id < y.doc_id),
           |j AS (SELECT doc_id_a, doc_id_b,
           |        CAST(sum(bit_count(xor(ba.bucket, bb.bucket))) AS INT) AS hamming
           |      FROM cand JOIN sb ba ON ba.doc_id = doc_id_a
           |                JOIN sb bb ON bb.doc_id = doc_id_b AND bb.band = ba.band
           |      GROUP BY doc_id_a, doc_id_b)
           |SELECT doc_id_a, doc_id_b, hamming FROM j WHERE hamming <= 3""".stripMargin,
      "q_dedup_clusters" -> dedupClustersSql(words),
      "q_dedup_firstwins" -> // keep iff no lower-id doc occupies any of
        // the doc's band buckets (bucket-min comparison — no pair set)
        (s"WITH ${lshBandsCte(words)},\n" +
          """bmin AS (SELECT band, sig, min(doc_id) AS min_id FROM bands GROUP BY band, sig),
             |dropped AS (SELECT b.doc_id FROM bands b
             |            JOIN bmin m ON m.band = b.band AND m.sig = b.sig
             |            GROUP BY b.doc_id HAVING min(m.min_id) < b.doc_id)
             |SELECT doc_id, lang, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin),
      "q_dedup_keep" -> // terminal dedup stage: documents minus
        // non-representative cluster members (min-id doc survives;
        // singletons survive by absence from the cluster table)
        ("WITH clusters AS (\n" + dedupClustersSql(words) + ")\n" +
          "SELECT doc_id, lang, n_chars FROM documents\n" +
          "WHERE doc_id NOT IN " +
          "(SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)"),
      "q_event_sessions" ->
        """WITH e AS (SELECT user_id, event_id, ts,
          |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
          |l AS (SELECT user_id, event_id, ts, ts_s,
          |        lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |      FROM e),
          |s AS (SELECT user_id, ts, event_id, ts_s,
          |        CAST(sum(CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > 1800
          |                      THEN 1 ELSE 0 END)
          |          OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |      FROM l)
          |SELECT user_id, session_id, count(*) AS n_events, min(ts_s) AS start_s
          |FROM s GROUP BY user_id, session_id""".stripMargin,
      "q_jaccard_pairs" ->
        s"""WITH ws AS (SELECT DISTINCT doc_id, w FROM ($words)),
           |sizes AS (SELECT doc_id, count(*) AS n FROM ws GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_id_a, count(*) AS n_inter
           |          FROM ws a JOIN ws b ON a.w = b.w AND b.doc_id = a.doc_id + 1
           |          GROUP BY a.doc_id)
           |SELECT doc_id_a, round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jaccard
           |FROM inter
           |JOIN sizes na ON na.doc_id = doc_id_a
           |JOIN sizes nb ON nb.doc_id = doc_id_a + 1""".stripMargin,
      "q_jaccard_lsh" ->
        (s"WITH ${lshBandsCte(words)},\n" +
        s"""pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
           |          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
           |            AND a.doc_id < b.doc_id),
           |ws AS (SELECT DISTINCT doc_id, w FROM ($words)),
           |sizes AS (SELECT doc_id, count(*) AS n FROM ws GROUP BY doc_id),
           |inter AS (SELECT p.doc_id_a, p.doc_id_b, count(*) AS n_inter
           |          FROM pairs p JOIN ws a ON a.doc_id = p.doc_id_a
           |                       JOIN ws b ON b.doc_id = p.doc_id_b AND b.w = a.w
           |          GROUP BY p.doc_id_a, p.doc_id_b),
           |j AS (SELECT i.doc_id_a, i.doc_id_b,
           |        round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jaccard
           |      FROM inter i JOIN sizes na ON na.doc_id = i.doc_id_a
           |                   JOIN sizes nb ON nb.doc_id = i.doc_id_b)
           |SELECT doc_id_a, doc_id_b, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin),
      "q_chunks" -> // mirror of TextOps.chunks(budget=16, overlap=4):
        // stride 12, chunk i = toks[i*12+1 .. i*12+16] (1-based inclusive)
        """WITH t AS (SELECT doc_id,
          |    list_filter(string_split(text,' '), w -> w <> '') AS toks
          |  FROM documents),
          |c AS (SELECT doc_id, toks,
          |    CASE WHEN len(toks) = 0 THEN 0
          |         ELSE 1 + CAST(ceil(greatest(len(toks) - 16, 0) / 12.0) AS INT)
          |    END AS nc
          |  FROM t),
          |x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)
          |SELECT doc_id, CAST(i AS INT) AS chunk_id,
          |  array_to_string(toks[i*12+1 : i*12+16], ' ') AS chunk,
          |  CAST(len(toks[i*12+1 : i*12+16]) AS INT) AS n_tokens
          |FROM x""".stripMargin,
      "q_pii_scrub" -> { // mirror of TextOps.piiScrub over the injected
        // corpus; DuckDB regexp_replace needs the 'g' flag (Spark replaces
        // all occurrences by default)
        val em = TextOps.EmailRegex
        val ip = TextOps.Ipv4Regex
        val num = TextOps.LongDigitsRegex
        s"""WITH t AS (SELECT doc_id,
           |    text || ' user' || doc_id || '@mail.example.com from 10.0.' ||
           |    (doc_id % 256) || '.7 id 123456' || doc_id AS text
           |  FROM documents)
           |SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
           |    '$num', '<NUM>', 'g') AS cleaned,
           |  CAST(len(regexp_extract_all(text, '$em'))
           |    + len(regexp_extract_all(regexp_replace(text, '$em', '<EMAIL>', 'g'), '$ip'))
           |    + len(regexp_extract_all(regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$num'))
           |    AS INT) AS n_redactions
           |FROM t""".stripMargin
      },
      "q_repetition" ->
        s"""SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |  round(CAST(max_tf AS DOUBLE) / n_words, 4) AS top_word_ratio,
           |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS repeated_mass
           |FROM (SELECT doc_id, sum(tf) AS n_words, max(tf) AS max_tf,
           |        count(*) AS n_distinct
           |      FROM (SELECT doc_id, w, count(*) AS tf FROM ($words)
           |            GROUP BY doc_id, w)
           |      GROUP BY doc_id)""".stripMargin,
      "q_decontaminate" -> { // mirror of TextOps.decontaminate(n=13) over
        // the derived eval set (first 30 words of every 20th doc): each
        // word hashed once per channel, gram i = dual fold of word hashes
        // [i, i+13); a gram matches the eval set iff BOTH channels agree;
        // range() stop is exclusive so i runs 1..len-12 — identical to
        // Spark's sequence(1, size-12)
        s"""WITH wh AS $whCte13,
           |tg AS (SELECT doc_id, $gramFold13a AS g1, $gramFold13b AS g2
           |  FROM (SELECT doc_id, wh1, wh2, unnest(range(1, len(wh1)-11)) AS i
           |        FROM wh WHERE len(wh1) >= 13)),
           |ev AS (SELECT DISTINCT $gramFold13a AS g1, $gramFold13b AS g2
           |  FROM (SELECT wh1, wh2, unnest(range(1, len(wh1)-11)) AS i
           |        FROM (SELECT wh1[1:30] AS wh1, wh2[1:30] AS wh2 FROM wh
           |              WHERE doc_id % 20 = 0)
           |        WHERE len(wh1) >= 13))
           |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           |  CAST(count(e.g1) AS BIGINT) AS n_matched,
           |  count(e.g1) > 0 AS contaminated
           |FROM tg t LEFT JOIN ev e ON e.g1 = t.g1 AND e.g2 = t.g2
           |GROUP BY t.doc_id""".stripMargin
      },
      "q_unigram_lm" -> // mirror of TextOps.unigramScore(vocabSize=20):
        // top-V words by (freq desc, w asc), ppm = freq*10^6 div total
        // occurrences, doc score = mean in-vocab ppm (OOV → 0)
        s"""WITH wc AS (SELECT w, count(*) AS freq FROM ($words) GROUP BY w),
           |tot AS (SELECT sum(freq) AS total FROM wc),
           |voc AS (SELECT w, freq * 1000000 // (SELECT total FROM tot) AS ppm
           |        FROM wc ORDER BY freq DESC, w ASC LIMIT $UnigramV)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(count(*) - count(v.ppm) AS BIGINT) AS n_oov,
           |  round(CAST(sum(coalesce(v.ppm, 0)) AS DOUBLE) / count(*), 4)
           |    AS score_ppm
           |FROM ($words) t LEFT JOIN voc v ON v.w = t.w
           |GROUP BY doc_id""".stripMargin,
      "q_quality_buckets" -> // mirror of TextOps.qualityBuckets: the
        // q_unigram_lm score CTE + sharded ntile (score desc, doc_id asc)
        s"""WITH wc AS (SELECT w, count(*) AS freq FROM ($words) GROUP BY w),
           |voc AS (SELECT w, freq * 1000000 //
           |          (SELECT sum(freq) FROM wc) AS ppm
           |        FROM wc ORDER BY freq DESC, w ASC LIMIT $UnigramV),
           |sc AS (SELECT doc_id,
           |  round(CAST(sum(coalesce(v.ppm, 0)) AS DOUBLE) / count(*), 4)
           |    AS score_ppm
           |  FROM ($words) t LEFT JOIN voc v ON v.w = t.w
           |  GROUP BY doc_id)
           |SELECT doc_id, doc_id // $PackShardSize AS shard, score_ppm,
           |  ntile(3) OVER (PARTITION BY doc_id // $PackShardSize
           |    ORDER BY score_ppm DESC, doc_id ASC) AS bucket
           |FROM sc""".stripMargin,
      "q_dsir" -> // mirror of TextOps.importanceWeights over the derived
        // target set (doc_id % 7 = 0): two top-V ppm tables (same freq
        // desc / word asc tiebreak and integer div as q_unigram_lm),
        // score = mean (target ppm − corpus ppm) with OOV → 0
        s"""WITH wc AS (SELECT w, count(*) AS freq FROM ($words) GROUP BY w),
           |voc_c AS (SELECT w, freq * 1000000 //
           |            (SELECT sum(freq) FROM wc) AS ppm
           |          FROM wc ORDER BY freq DESC, w ASC LIMIT $UnigramV),
           |tw AS (SELECT doc_id, w FROM ($words) WHERE doc_id % 7 = 0),
           |twc AS (SELECT w, count(*) AS freq FROM tw GROUP BY w),
           |voc_t AS (SELECT w, freq * 1000000 //
           |            (SELECT sum(freq) FROM twc) AS ppm
           |          FROM twc ORDER BY freq DESC, w ASC LIMIT $UnigramV)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  round(CAST(sum(coalesce(t.ppm, 0) - coalesce(c.ppm, 0))
           |    AS DOUBLE) / count(*), 4) AS dsir_score
           |FROM ($words) d LEFT JOIN voc_t t ON t.w = d.w
           |  LEFT JOIN voc_c c ON c.w = d.w
           |GROUP BY doc_id""".stripMargin,
      "q_mixing" -> // mirror of TextOps.mixingWeights: α=1/2 temperature
        // weights, s = floor(sqrt(n)·10^6) exact-integer normalization
        """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
          |s AS (SELECT lang, n_docs,
          |        CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS s FROM c),
          |t AS (SELECT sum(n_docs) AS total_docs, sum(s) AS total_s FROM s)
          |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
          |  round(CAST(n_docs AS DOUBLE) / total_docs, 6) AS p,
          |  round(CAST(s AS DOUBLE) / total_s, 6) AS w
          |FROM s CROSS JOIN t""".stripMargin,
      "q_span_dedup" -> { // mirror of TextOps.spanDedupStats(n=13): same
        // dual word-hash + gram-fold CTEs as q_decontaminate; a gram is
        // duplicated iff its (g1,g2) key occurs in ≥ 2 distinct documents
        // (the oracle states the rule as a count-distinct; the engine's
        // min≠max window is semantically identical)
        s"""WITH wh AS $whCte13,
           |tg AS (SELECT doc_id, $gramFold13a AS g1, $gramFold13b AS g2
           |  FROM (SELECT doc_id, wh1, wh2, unnest(range(1, len(wh1)-11)) AS i
           |        FROM wh WHERE len(wh1) >= 13)),
           |dup AS (SELECT g1, g2 FROM (SELECT g1, g2,
           |          count(DISTINCT doc_id) AS nd FROM tg GROUP BY g1, g2)
           |        WHERE nd >= 2)
           |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           |  CAST(count(d.g1) AS BIGINT) AS n_dup,
           |  round(CAST(count(d.g1) AS DOUBLE) / count(*), 4) AS dup_ratio
           |FROM tg t LEFT JOIN dup d ON d.g1 = t.g1 AND d.g2 = t.g2
           |GROUP BY t.doc_id""".stripMargin
      },
      "q_span_removal" -> { // mirror of TextOps.removeDuplicateSpans(n=13):
        // dup-gram start positions per doc, then an indexed list_filter —
        // DuckDB lambda indexes are 1-based, matching the engine's
        // (pos + 1) gram starts; a word at i is dropped iff a dup gram
        // starts in [i-12, i]
        s"""WITH d AS (SELECT doc_id, list_filter(string_split(text,' '),
           |    w -> w <> '') AS ws FROM documents),
           |wh AS (SELECT doc_id, ws,
           |    list_transform(ws, w -> $wordHash13a) AS wh1,
           |    list_transform(ws, w -> $wordHash13b) AS wh2 FROM d),
           |tg AS (SELECT doc_id, i, $gramFold13a AS g1, $gramFold13b AS g2
           |  FROM (SELECT doc_id, wh1, wh2, unnest(range(1, len(wh1)-11)) AS i
           |        FROM wh WHERE len(wh1) >= 13)),
           |dup AS (SELECT g1, g2 FROM (SELECT g1, g2,
           |          count(DISTINCT doc_id) AS nd FROM tg GROUP BY g1, g2)
           |        WHERE nd >= 2),
           |st AS (SELECT doc_id, list_sort(list(DISTINCT i)) AS starts
           |       FROM tg JOIN dup USING (g1, g2) GROUP BY doc_id),
           |k AS (SELECT w.doc_id, w.ws, coalesce(st.starts, []) AS starts
           |      FROM wh w LEFT JOIN st USING (doc_id)),
           |kk AS (SELECT doc_id, ws, list_filter(ws, (w, i) ->
           |         len(list_filter(starts, s -> s <= i AND i < s + 13)) = 0
           |       ) AS kept FROM k)
           |SELECT doc_id,
           |  coalesce(array_to_string(kept, ' '), '') AS cleaned,
           |  CAST(len(ws) - len(kept) AS BIGINT) AS n_removed FROM kk""".stripMargin
      },
      "q_langid" ->
        """SELECT doc_id, lang,
          |  round(CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
          |    / greatest(len(list_filter(string_split(text,' '), w -> w <> '')), 1), 4) AS stop_ratio
          |FROM documents""".stripMargin,
      "q_quality" ->
        """SELECT doc_id, n_chars, n_words,
          |  round(CAST(n_chars AS DOUBLE) / greatest(n_words, 1), 4) AS avg_word_len,
          |  round(CAST(n_distinct AS DOUBLE) / greatest(n_words, 1), 4) AS distinct_ratio
          |FROM (SELECT doc_id, any_value(n_chars) AS n_chars, count(*) AS n_words,
          |        count(DISTINCT w) AS n_distinct
          |      FROM (SELECT doc_id, n_chars, unnest(string_split(text,' ')) AS w FROM documents)
          |      WHERE w <> '' GROUP BY doc_id)""".stripMargin,
      "q_cosine_topk" ->
        """SELECT b.vec_id, round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
          |FROM embeddings a, embeddings b
          |WHERE a.vec_id = 0 AND b.vec_id <> 0
          |ORDER BY cos DESC, b.vec_id LIMIT 20""".stripMargin,
      "q_cosine_neardup" ->
        """SELECT a.vec_id AS vec_id_a,
          |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
          |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.15""".stripMargin,
      "q_cosine_neardup_lsh" -> // lshBuckets(numPlanes=6) pair join +
        // exact cosine ≥ 0.15 (mirrors cosineNearDupLsh)
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          |dims AS (SELECT vec_id, d, emb[CAST(d AS INT)+1] AS x
          |         FROM e CROSS JOIN (SELECT unnest(range(0,64)) AS d)),
          |proj AS (SELECT vec_id, h,
          |           sum(CAST(floor(x*10000) AS BIGINT) *
          |               (((d*2654435761 + h*40503) % 97 % 2)*2 - 1)) AS pr
          |         FROM dims CROSS JOIN (SELECT unnest(range(0,6)) AS h)
          |         GROUP BY vec_id, h),
          |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN CAST(pow(2,h) AS BIGINT)
          |        ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id),
          |wb AS (SELECT e.vec_id, b.bucket, e.emb FROM e JOIN b USING (vec_id)),
          |j AS (SELECT a.vec_id AS vec_id_a, c.vec_id AS vec_id_b,
          |        round(list_cosine_similarity(a.emb, c.emb), 4) AS cos
          |      FROM wb a JOIN wb c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
          |SELECT vec_id_a, vec_id_b, cos FROM j WHERE cos >= 0.15""".stripMargin,
      "q_semi_join" ->
        """SELECT o_orderkey, o_orderstatus FROM orders
          |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin,
      "q_anti_join" ->
        """SELECT o_orderkey FROM orders
          |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""".stripMargin,
      "q_join_agg" ->
        """SELECT o_orderpriority, count(*) AS n_items,
          |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin,
      "q_event_windows" ->
        """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
          |  event_type, count(*) AS n,
          |  round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
          |FROM events GROUP BY 1, 2""".stripMargin,
      "q_window_events" ->
        """SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
          |  count(*) AS n, round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
          |FROM events GROUP BY event_type, CAST(floor(epoch(ts)/3600) AS BIGINT)""".stripMargin,
      "q_stopword_filter" -> {
        val list = graft.tokenize.StopwordData.Words.toSeq.sorted
          .map(w => "'" + w.replace("'", "''") + "'").mkString(",")
        // coalesce: DuckDB array_to_string([]) is NULL where Spark
        // array_join([]) is '' — an all-stopword doc must stay ''
        s"""SELECT doc_id, coalesce(array_to_string(list_filter(
           |  string_split(text,' '),
           |  w -> w <> '' AND lower(w) NOT IN ($list)), ' '), '') AS cleaned
           |FROM documents""".stripMargin
      },
      // ---- engine oracles (round-2: every e_* row driver-checkable)
      "e_docid_map" ->
        s"""WITH $ids SELECT "docId", repo, path, cmt AS "commit", lang FROM ids""",
      "e_index_search" ->
        s"""WITH $idWords$mergeJoin
           |SELECT i."docId", i.repo, i.path FROM ids i JOIN mm USING ("docId")""".stripMargin,
      "e_index_topk_double" ->
        s"""WITH $bmw
           |SELECT i."docId", i.repo, i.path, round(
           |  $bmwScore, 4) AS score
           |$bmwFrom
           |ORDER BY score DESC, "docId" LIMIT 50""".stripMargin,
      "e_tweaked_search" ->
        s"""WITH $bmw
           |SELECT i."docId", i.repo, i.path, round(
           |  ($bmwScore)
           |  * 1000.0 / greatest(20.0, least(CAST(i.n_chars AS DOUBLE), 1000.0))
           |  / greatest(1.0, least(1700000000.0, 5000000.0)), 12) AS score
           |$bmwFrom
           |ORDER BY score DESC, "docId" LIMIT 50""".stripMargin,
      "e_index_wand_or" ->
        s"""WITH $idWords
           |SELECT DISTINCT i."docId", i.repo, i.path FROM ids i JOIN idw USING ("docId")
           |WHERE idw.w IN ('vector','stream','window')""".stripMargin,
      "e_index_regex" ->
        s"""WITH $ids
           |SELECT "docId", repo, path FROM ids WHERE regexp_matches(content, 'merge (join|sort)')""".stripMargin,
      "e_lang_stats" ->
        s"""WITH $idWords
           |SELECT lang, count(*) AS "count" FROM ids
           |WHERE "docId" IN (SELECT "docId" FROM idw WHERE w = 'merge') GROUP BY lang""".stripMargin,
      "e_query_language" ->
        s"""WITH $ids
           |SELECT "docId", repo, path, lang FROM ids
           |WHERE lang IN ('en','de') AND regexp_matches(content, 'merge\\s+join')""".stripMargin,
      "e_path_search" ->
        s"""WITH $idWords
           |SELECT i."docId", i.repo, i.path FROM ids i
           |WHERE contains(i.path, 'oc/1')
           |  AND i."docId" IN (SELECT "docId" FROM idw WHERE w = 'merge')""".stripMargin,
      "e_path_highlight" -> // every file hit's path highlight count under
        // the quoted 'oc/1' pattern (paths are lowercase; non-overlapping
        // find() occurrences — mirror of Snippets.highlight)
        s"""WITH $idWords
           |SELECT i.path,
           |  CAST(len(regexp_extract_all(i.path, 'oc/1')) AS INT) AS n_highlights
           |FROM ids i
           |WHERE contains(i.path, 'oc/1')
           |  AND i."docId" IN (SELECT "docId" FROM idw WHERE w = 'merge')""".stripMargin,
      "e_symbol_search" ->
        """SELECT source AS repo, 'code/' || doc_id AS path
          |FROM documents WHERE split_part(text, ' ', 1) = 'merge'""".stripMargin,
      "e_open_listing" -> // substring repo match, mirroring listDir's
        // lower(repo).contains; DISTINCT mirrors listDir's distinct() so
        // the row stays robust if the corpus ever grows a source whose
        // entries collide (round-2 ADVICE)
        """SELECT DISTINCT source AS repo, 'doc/' || doc_id AS entry,
          |false AS is_dir FROM documents WHERE contains(lower(source), 'src2')""".stripMargin,
      "e_fuzzy_path" ->
        s"""WITH $ids
           |SELECT "docId", path, repo,
           |  CAST(84 + CASE WHEN substr(path,5,1) = '1' THEN 4 ELSE 0 END
           |       - length(path) AS INT) AS fuzzy_score
           |FROM ids WHERE path LIKE 'doc/%1%'
           |ORDER BY fuzzy_score DESC, "docId" LIMIT 20""".stripMargin,
      "e_snippets" ->
        s"""WITH $ids
           |SELECT "docId", repo, path, CAST(1 AS INT) AS n_snippets,
           |  CAST(len(regexp_extract_all(content, 'merge\\s+join')) AS INT) AS n_highlights,
           |  substr(content, 1, 60) AS first_snippet
           |FROM ids WHERE regexp_matches(content, 'merge\\s+join')""".stripMargin,
      "e_symbol_snippets" ->
        """SELECT source AS repo, 'code/' || doc_id AS path,
          |  CAST(1 AS INT) AS n_snippets, CAST(1 AS INT) AS n_highlights,
          |  'fn ' || split_part(text,' ',1) || '_run() { return 0 }' AS first_snippet
          |FROM documents WHERE split_part(text, ' ', 1) = 'merge'""".stripMargin,
      "e_incremental" ->
        """SELECT source AS repo, 'doc/' || doc_id AS path FROM documents
          |WHERE source <> 'src0' AND doc_id IN (
          |  SELECT doc_id FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          |  WHERE w IN ('merge','join') GROUP BY doc_id HAVING count(DISTINCT w) = 2)""".stripMargin,
      "e_repo_search" ->
        """SELECT DISTINCT source AS name FROM documents
          |WHERE contains(lower(source), 'rc1')
          |   OR regexp_matches(lower(source), 'src1[0-9]')""".stripMargin,
      "e_org_repo_search" -> // org segment must match AND the name must
        // match the repo literal (executeRepo org-qualified byte filter)
        """SELECT DISTINCT (CASE WHEN doc_id % 2 = 0 THEN 'acme/' ELSE 'beta/' END)
          |  || source AS name
          |FROM documents
          |WHERE doc_id % 2 = 0 AND contains(lower(source), 'rc1')""".stripMargin,
      "e_case_search" -> // double-BM25 witness over the CASED word stream
        // of the mixed-case corpus (mirror of caseCorpus +
        // searchDoubleWitness("c:Merge","c:join") — exact-case tf/df)
        """WITH corpus AS (
          |  SELECT source AS repo, 'case/' || doc_id AS path, 'main' AS cmt,
          |         CASE WHEN doc_id % 2 = 0
          |              THEN upper(substr(text,1,1)) || substr(text,2)
          |              ELSE text END AS content
          |  FROM documents),
          |ids AS (
          |  SELECT CAST(row_number() OVER (
          |           ORDER BY sha256(repo || chr(0) || path || chr(0) || cmt))
          |         AS BIGINT) AS "docId", repo, path, content
          |  FROM corpus),
          |idw AS (SELECT "docId", w FROM (
          |    SELECT "docId", unnest(string_split(content,' ')) AS w FROM ids)
          |  WHERE w <> ''),
          |lens AS (SELECT "docId", count(*) AS dl FROM idw GROUP BY "docId"),
          |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM lens),
          |tf AS (SELECT "docId", w, count(*) AS tf FROM idw GROUP BY "docId", w),
          |s1 AS (SELECT "docId", tf AS tf1 FROM tf WHERE w = 'Merge'),
          |s2 AS (SELECT "docId", tf AS tf2 FROM tf WHERE w = 'join'),
          |d1 AS (SELECT count(*) AS df1 FROM s1),
          |d2 AS (SELECT count(*) AS df2 FROM s2)
          |SELECT i."docId", i.repo, i.path, round(
          |  ln(1.0 + (n - df1 + 0.5)/(df1 + 0.5)) * 2.2 * tf1 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl)) +
          |  ln(1.0 + (n - df2 + 0.5)/(df2 + 0.5)) * 2.2 * tf2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl)), 4) AS score
          |FROM s1 JOIN s2 USING ("docId") JOIN lens USING ("docId") JOIN ids i USING ("docId")
          |CROSS JOIN stats CROSS JOIN d1 CROSS JOIN d2
          |ORDER BY score DESC, "docId" LIMIT 50""".stripMargin,
      "e_lsh_topk" -> // query-adaptive multi-probe: flip-mask set = every
        // subset of the 3 planes with smallest |proj| for the query
        // (mirrors Similarity.lshTopK probeBits=3; ties by plane id)
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          |dims AS (SELECT vec_id, d, emb[CAST(d AS INT)+1] AS x
          |         FROM e CROSS JOIN (SELECT unnest(range(0,64)) AS d)),
          |proj AS (SELECT vec_id, h,
          |           sum(CAST(floor(x*10000) AS BIGINT) *
          |               (((d*2654435761 + h*40503) % 97 % 2)*2 - 1)) AS pr
          |         FROM dims CROSS JOIN (SELECT unnest(range(0,6)) AS h)
          |         GROUP BY vec_id, h),
          |b AS (SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN CAST(pow(2,h) AS BIGINT)
          |        ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id),
          |qp AS (SELECT h, pr FROM proj WHERE vec_id = 0),
          |flip AS (SELECT h, rn - 1 AS r FROM (
          |    SELECT h, row_number() OVER (ORDER BY abs(pr), h) AS rn FROM qp)
          |  WHERE rn <= 3),
          |masks AS (SELECT CAST(sum(CASE WHEN ((s >> CAST(r AS INT)) & 1) = 1
          |            THEN CAST(pow(2,h) AS BIGINT) ELSE 0 END) AS BIGINT) AS mask
          |          FROM (SELECT unnest(range(0,8)) AS s) CROSS JOIN flip
          |          GROUP BY s),
          |q AS (SELECT b.bucket AS qb, e.emb AS qe FROM b JOIN e USING (vec_id) WHERE vec_id = 0)
          |SELECT e.vec_id, round(list_cosine_similarity(e.emb, q.qe), 4) AS cos
          |FROM e JOIN b USING (vec_id) CROSS JOIN q
          |WHERE xor(b.bucket, q.qb) IN (SELECT mask FROM masks) AND e.vec_id <> 0
          |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin,
      "e_ivf_topk" -> // mirror of buildIvfIndex + ivfTopKIndexed under the
        // PRODUCTION parameterization (round-4 VERDICT #4): nlist =
        // clamp(ceil(√N), 16, 65536), nprobe = max(4, nlist // 4), init =
        // the nlist smallest (vec_id·2654435761 % 1000000007, vec_id)
        // rows with cid = that rank (hash-sampled, not first-N). The
        // persisted artifacts are the deterministic exact-integer Lloyd
        // values, so the oracle re-derives them — quantize floor(x·1e4),
        // assign by argmax BIGINT dot (ties → smaller cid), update by
        // per-dim EXACT integer floor division (s - pmod(s,c))/c, empty
        // cells keep their centroid; two unrolled iterations
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
          |p AS (SELECT least(65536, greatest(16,
          |        CAST(ceil(sqrt(count(*))) AS BIGINT))) AS nl FROM e),
          |pp AS (SELECT nl, greatest(4, nl // 4) AS np FROM p),
          |sel AS (SELECT vec_id, row_number() OVER (
          |          ORDER BY (vec_id*2654435761) % 1000000007, vec_id) - 1 AS cid
          |        FROM e),
          |dims AS (SELECT vec_id, d,
          |           CAST(floor(emb[CAST(d AS INT)+1]*10000) AS BIGINT) AS x
          |         FROM e CROSS JOIN (SELECT unnest(range(0,64)) AS d)),
          |c0 AS (SELECT sel.cid, dims.d, dims.x AS cx
          |       FROM dims JOIN sel USING (vec_id)
          |       WHERE sel.cid < (SELECT nl FROM pp)),
          |d1 AS (SELECT dims.vec_id, cid, sum(x*cx) AS dp
          |       FROM dims JOIN c0 USING (d) GROUP BY dims.vec_id, cid),
          |a1 AS (SELECT vec_id, cid AS cell FROM (
          |    SELECT vec_id, cid, row_number() OVER (
          |      PARTITION BY vec_id ORDER BY dp DESC, cid) AS rn FROM d1)
          |  WHERE rn = 1),
          |u1 AS (SELECT a1.cell AS cid, dims.d,
          |         (sum(dims.x) - ((sum(dims.x) % count(*)) + count(*)) % count(*)) // count(*) AS cx
          |       FROM dims JOIN a1 USING (vec_id) GROUP BY a1.cell, dims.d),
          |c1 AS (SELECT cid, d, cx FROM u1 UNION ALL
          |       SELECT cid, d, cx FROM c0
          |       WHERE cid NOT IN (SELECT DISTINCT cid FROM u1)),
          |d2 AS (SELECT dims.vec_id, cid, sum(x*cx) AS dp
          |       FROM dims JOIN c1 USING (d) GROUP BY dims.vec_id, cid),
          |a2 AS (SELECT vec_id, cid AS cell FROM (
          |    SELECT vec_id, cid, row_number() OVER (
          |      PARTITION BY vec_id ORDER BY dp DESC, cid) AS rn FROM d2)
          |  WHERE rn = 1),
          |u2 AS (SELECT a2.cell AS cid, dims.d,
          |         (sum(dims.x) - ((sum(dims.x) % count(*)) + count(*)) % count(*)) // count(*) AS cx
          |       FROM dims JOIN a2 USING (vec_id) GROUP BY a2.cell, dims.d),
          |c2 AS (SELECT cid, d, cx FROM u2 UNION ALL
          |       SELECT cid, d, cx FROM c1
          |       WHERE cid NOT IN (SELECT DISTINCT cid FROM u2)),
          |df AS (SELECT dims.vec_id, cid, sum(x*cx) AS dp
          |       FROM dims JOIN c2 USING (d) GROUP BY dims.vec_id, cid),
          |af AS (SELECT vec_id, cid AS cell FROM (
          |    SELECT vec_id, cid, row_number() OVER (
          |      PARTITION BY vec_id ORDER BY dp DESC, cid) AS rn FROM df)
          |  WHERE rn = 1),
          |pr AS (SELECT cid FROM (
          |    SELECT cid, row_number() OVER (ORDER BY dp DESC, cid) AS rn
          |    FROM df WHERE vec_id = 0)
          |  WHERE rn <= (SELECT np FROM pp))
          |SELECT e.vec_id, round(list_cosine_similarity(e.emb, q.qe), 4) AS cos
          |FROM e JOIN af USING (vec_id) CROSS JOIN q
          |WHERE af.cell IN (SELECT cid FROM pr) AND e.vec_id <> 0
          |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin,
      "e_media_features" ->
        """WITH m AS (SELECT i AS media_id,
          |    CASE CAST(i%3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          |    CAST(64 + (i%192) AS BIGINT) AS ns FROM (SELECT unnest(range(0,300)) AS i)),
          |s AS (SELECT media_id, kind, ns, unnest(range(0, ns)) AS j FROM m),
          |c AS (SELECT media_id, any_value(kind) AS kind, any_value(ns) AS ns,
          |        sum(CASE WHEN (media_id*131 + j*31 + 7) % 251 <= 31 THEN 1 ELSE 0 END) AS c0
          |      FROM s GROUP BY media_id)
          |SELECT kind, count(*) AS n, round(CAST(sum(c0) AS DOUBLE)/sum(ns), 4) AS avg_bin0
          |FROM c GROUP BY kind""".stripMargin,
      "e_frame_sample" ->
        """SELECT i AS media_id,
          |  CAST(ceil(greatest(1, (64 + (i%192)) // 32) / 4.0) AS INT) AS n_sampled
          |FROM (SELECT unnest(range(0,300)) AS i) WHERE i % 3 = 2""".stripMargin,
    )
  }

  /** DuckDB mirror of bm25Sql: same formula shape, same explicit two-term
    * addition, double precision.
    */
  private def bm25OracleSql(t1: String, t2: String, k: Int): String =
    s"""WITH w AS (SELECT doc_id, w FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) WHERE w <> ''),
       |lens AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
       |s1 AS (SELECT doc_id, tf AS tf1 FROM tf WHERE w = '$t1'),
       |s2 AS (SELECT doc_id, tf AS tf2 FROM tf WHERE w = '$t2'),
       |d1 AS (SELECT count(*) AS df1 FROM s1),
       |d2 AS (SELECT count(*) AS df2 FROM s2)
       |SELECT doc_id, round(
       |  ln(1.0 + (n - df1 + 0.5)/(df1 + 0.5)) * 2.2 * tf1 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl)) +
       |  ln(1.0 + (n - df2 + 0.5)/(df2 + 0.5)) * 2.2 * tf2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl)), 4) AS score
       |FROM s1 JOIN s2 USING (doc_id) JOIN lens USING (doc_id)
       |CROSS JOIN stats CROSS JOIN d1 CROSS JOIN d2
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
}
