package graft.index

import scala.collection.mutable
import graft.score.Bm25

/** Delta + variable-byte posting compression (SURVEY §2.11, §7.4).
  *
  * Plays the role of tantivy's SIMD-compressed posting blocks (the physical
  * layer under every TermQuery the reference runs). Byte-level control is
  * exactly the case where `mapPartitions` beats Catalyst expressions
  * (SURVEY §7.4): the codec runs inside the encode/scan tasks, never as a
  * per-row UDF.
  *
  * Entry layout (per posting, within a block):
  *   varint(docId - prevDocId)   // prev = 0 for the first entry of a block,
  *                               // so every block decodes independently —
  *                               // required for WAND block skipping
  *   varint(tf)
  *   byte(normId)                // quantized doc length: scoring needs no
  *                               // docs-table join at query time
  * Blocks hold ≤ BlockSize entries with (firstDocId, lastDocId, maxTf,
  * minNormId) metadata for skip + block-max pruning — the score bound is
  * derived from (maxTf, minNormId) with the QUERY's norm cache (see
  * Model.Block), never baked at build time; the build-avgdl maxTfNorm
  * float is kept only for the dict stats row.
  */
object PostingCodec {
  val BlockSize = 128

  // -- varint ----------------------------------------------------------
  def writeVarLong(v0: Long, out: mutable.ArrayBuilder[Byte]): Unit = {
    var v = v0
    require(v >= 0, s"varint of negative $v")
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Mutable cursor for decode. */
  final class Reader(val bytes: Array[Byte]) {
    var pos: Int = 0
    def readVarLong(): Long = {
      var shift = 0
      var v = 0L
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v | ((b & 0x7fL) << shift)
      }
    def readByte(): Byte = { val b = bytes(pos); pos += 1; b }
    def hasNext: Boolean = pos < bytes.length
  }

  /** Encode one (term,bucket) run of postings — MUST be sorted by docId,
    * strictly increasing — into blocks. normCache = Bm25.normCache(avgdl).
    */
  def encodeRun(entries: Iterator[(Long, Int, Byte)],
                normCache: Array[Float]): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val buf = mutable.ArrayBuilder.make[Byte]
    var n = 0
    var first = -1L
    var prev = 0L
    var maxTf = 0
    var maxTfNorm = 0f
    var minNormId = 255
    def flush(): Unit = if (n > 0) {
      blocks += Block(first, prev, maxTf, maxTfNorm, minNormId, n, buf.result())
      buf.clear(); n = 0; first = -1L; maxTf = 0; maxTfNorm = 0f
      minNormId = 255
    }
    entries.foreach { case (docId, tf, normId) =>
      if (n == 0) { first = docId; prev = 0L }
      require(docId > prev || n == 0, s"postings not sorted: $docId after $prev")
      writeVarLong(docId - (if (n == 0) 0L else prev), buf)
      writeVarLong(tf.toLong, buf)
      buf += normId
      prev = docId
      if (tf > maxTf) maxTf = tf
      val u = normId & 0xff
      if (u < minNormId) minNormId = u
      val tn = Bm25.tfNorm(tf, normCache(u))
      if (tn > maxTfNorm) maxTfNorm = tn
      n += 1
      if (n == BlockSize) flush()
    }
    flush()
    blocks.result()
  }

  /** Decode one block to (docId, tf, normId) triples. */
  def decodeBlock(b: Block): Array[(Long, Int, Byte)] = {
    val r = new Reader(b.bytes)
    val out = new Array[(Long, Int, Byte)](b.n)
    var prev = 0L
    var i = 0
    while (i < b.n) {
      val docId = prev + r.readVarLong()
      val tf = r.readVarLong().toInt
      val normId = r.readByte()
      out(i) = (docId, tf, normId)
      prev = docId
      i += 1
    }
    out
  }

  /** Iterate a full run (blocks in order) lazily. */
  def decodeRun(blocks: Seq[Block]): Iterator[(Long, Int, Byte)] =
    blocks.iterator.flatMap(decodeBlock)
}
