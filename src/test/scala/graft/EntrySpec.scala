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
}
