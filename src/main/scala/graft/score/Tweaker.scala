package graft.score

/** Post-BM25 per-document score tweaks — the reference's DocumentTweaker
  * (server/bleep/src/query/ranking.rs:19-38, SURVEY §2.8 item 2):
  *
  *   score ×= 1 + 999·[lang present]
  *   score ÷= clamp(avgLineLength, 20, 1000)
  *   score ÷= min(now − lastCommitUnixSeconds, 5·10⁶)
  *
  * All in f32, applied after the BM25 sum. `now` is FROZEN as a query
  * parameter (the reference reads the wall clock, ranking.rs:30-35 — a
  * nondeterminism our spec removes, SURVEY §7.3). The input_hint corpus
  * carries no commit timestamp, so lastCommit defaults to 0 and the
  * recency factor clamps to the 5e6 constant — rank-neutral but kept so
  * the formula is complete for corpora that have the column.
  */
object Tweaker {
  val RecencyCap: Float = 5e6f

  def apply(score: Float, langPresent: Boolean, avgLineLength: Double,
            lastCommit: Long, now: Long): Float = {
    var s = score
    if (langPresent) s *= 1000f // 1 + 999
    val lineLen = math.min(math.max(avgLineLength, 20.0), 1000.0).toFloat
    s /= lineLen
    // lower clamp: now <= lastCommit (clock skew / frozen-now before the
    // commit) must not divide by zero or flip the sign
    val age = math.max(1f, math.min((now - lastCommit).toFloat, RecencyCap))
    s / age
  }
}
