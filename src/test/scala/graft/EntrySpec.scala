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
}
