package graft.score

/** Exact BM25 spec — tantivy 0.21 default semantics (the scorer behind every
  * freq-scored term query the reference issues: `IndexRecordOption::WithFreqs`
  * at server/bleep/src/query/compiler.rs:182,211; SURVEY.md §2.8).
  *
  * All arithmetic in Float (f32), exactly as tantivy computes it:
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))       [f32 result]
  *   weight(t)   = idf · (k1 + 1)
  *   normCache[id] = k1 · (1 − b + b · decode(id) / avgdl)    [256 entries]
  *   score(t,d)  = weight(t) · tf / (tf + normCache[normId(d)])
  *   k1 = 1.2, b = 0.75
  * Document length is the SmallFloat-quantized-then-decoded token count.
  * Multi-term scores are SUMMED IN ASCENDING TERM ORDER (f32 addition is
  * non-associative; fixed order makes results cluster-size-invariant,
  * SURVEY §7.5 item 1). BoostQuery multiplies (reference ×10 for path
  * terms, query/compiler.rs:137-139).
  */
object Bm25 {
  val K1: Float = 1.2f
  val B: Float = 0.75f

  def idf(df0: Long, n: Long): Float = {
    // df can exceed N in the "p:" namespace: not-indexed stubs carry path
    // grams but are excluded from N/avgdl. Clamp so idf stays positive —
    // an unclamped df > n flips the ratio negative (ranking docs with
    // MORE matching grams LOWER, NaN past df = 2n+0.5).
    val df = math.min(df0, n)
    val x = (n - df).toFloat + 0.5f
    val y = df.toFloat + 0.5f
    math.log1p((x / y).toDouble).toFloat
  }

  def weight(df: Long, n: Long): Float = idf(df, n) * (1f + K1)

  /** 256-entry cache: normId → k1·(1−b+b·len/avgdl), f32. */
  def normCache(avgdl: Float): Array[Float] =
    Array.tabulate(256) { id =>
      K1 * (1f - B + B * SmallFloat.DecodeTable(id).toFloat / avgdl)
    }

  /** Per-(term,doc) partial score. */
  @inline def partial(weight: Float, tf: Int, norm: Float): Float =
    weight * tf.toFloat / (tf.toFloat + norm)

  /** idf-independent part of the block upper bound: max over a posting block
    * of tf/(tf+norm); multiplied by weight(term) at query time this bounds
    * every score in the block (block-max WAND, SURVEY §4.4).
    */
  @inline def tfNorm(tf: Int, norm: Float): Float =
    tf.toFloat / (tf.toFloat + norm)

  /** Multiplicative slack applied to block bounds before pruning: the
    * bound partial(weight, maxTf, minNorm) and an entry's partial
    * partial(weight, tf, norm) are DIFFERENT f32 expression trees of
    * real values ordered bound ≥ entry — each tree carries ≤3 rounding
    * steps (ε = 2⁻²⁴ each), so inflating the bound by ~17ε makes the
    * computed bound dominate every computed entry score by construction.
    * Pruning with a slightly larger bound is always exact (just a hair
    * less aggressive).
    */
  val BoundSlack: Float = 1.000001f
}
