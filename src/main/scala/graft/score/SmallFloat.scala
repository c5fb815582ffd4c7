package graft.score

/** Fieldnorm (document length) quantization to a 1-byte id.
  *
  * tantivy 0.21 stores each document's field token count quantized to a u8
  * id using the same codec Lucene's SmallFloat `intToByte4`/`byte4ToInt`
  * defines (public semantics; reference consumes it for BM25 at
  * server/bleep/src/query/compiler.rs:182,211 via tantivy's default
  * Bm25Weight). This is a LOSSY step that changes scores versus exact
  * lengths, so rank identity requires reproducing it exactly (SURVEY.md
  * §2.8, §7.5 item 2).
  *
  * Codec (reconstructed from public Lucene SmallFloat semantics):
  *   - values are encoded with 3 mantissa bits + implicit leading bit:
  *     encode4(v) for v ≥ 8 is `((shift+1) << 3) | mantissa` where
  *     shift = highestBit(v) − 3 and mantissa = (v >> shift) & 7;
  *     v < 8 encodes as itself. decode4 inverts to `(mantissa|8) << shift`.
  *   - the byte space reserves the first NUM_FREE_VALUES = 255 − encode4(MaxInt)
  *     = 24 ids for exact small lengths: id(v) = v for v < 24, else
  *     24 + encode4(v − 24).
  *
  * Properties (ScalaCheck'd in SmallFloatSpec): monotone non-decreasing,
  * identity below 24, decode(encode(v)) ≤ v, decode∘encode idempotent.
  */
object SmallFloat {

  private val MaxInt4: Int = longToInt4(Int.MaxValue)
  val NumFreeValues: Int = 255 - MaxInt4 // = 24

  private def longToInt4(v: Long): Int = {
    require(v >= 0, s"negative fieldnorm $v")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(v)
    if (numBits < 4) v.toInt
    else {
      val shift = numBits - 4
      (((shift + 1) << 3) | ((v >>> shift) & 0x7)).toInt
    }
  }

  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x7).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x8) << shift
  }

  /** token count → quantized 1-byte id (0..255). */
  def intToByte4(v: Int): Byte = {
    require(v >= 0)
    if (v < NumFreeValues) v.toByte
    else (NumFreeValues + longToInt4((v - NumFreeValues).toLong)).toByte
  }

  /** quantized id → representative token count (lower bound of the bucket). */
  def byte4ToInt(b: Byte): Int = {
    val i = b & 0xff
    if (i < NumFreeValues) i
    else NumFreeValues + int4ToLong(i - NumFreeValues).toInt
  }

  /** Precomputed id → decoded-length table (256 entries), for scorers. */
  val DecodeTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}
