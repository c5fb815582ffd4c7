package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * oracleSql key must have a matching queries entry.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, with column parity") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle-only keys: ${ok diff qk}")
    // engine-only (rows-only-checked) queries are the e_* family
    assert((qk diff ok).forall(_.startsWith("e_")),
      s"q_* queries without oracle: ${(qk diff ok).filterNot(_.startsWith("e_"))}")
  }

  test("duplicateClusters: connected components over candidate pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 7L))
      .toDF("doc_id_a", "doc_id_b")
    val got = graft.pipeline.Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))
    // a longer chain still converges to the global min label
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val gotChain = graft.pipeline.Dedup.duplicateClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotChain == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("minhashCandidates giant-bucket cap drops degenerate buckets only") {
    import spark.implicits._
    // 6 identical docs -> one clique bucket per band; 2 distinct docs
    val docs = ((1 to 6).map(i => (i.toLong, "the same words exactly")) ++
      Seq((7L, "completely different payload seven"),
        (8L, "another unrelated text eight")))
      .toDF("doc_id", "text")
    val uncapped = graft.pipeline.Dedup.minhashCandidates(docs).count()
    assert(uncapped == 15) // C(6,2) identical-doc pairs
    val capped = graft.pipeline.Dedup.minhashCandidates(docs, maxBucket = Some(3))
    assert(capped.count() == 0) // the size-6 bucket is skipped
    val loose = graft.pipeline.Dedup.minhashCandidates(docs, maxBucket = Some(6))
    assert(loose.count() == 15) // cap above the bucket size changes nothing
  }
}
