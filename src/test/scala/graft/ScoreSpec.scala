package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.score.{Bm25, SmallFloat}
import graft.index.{Block, PostingCodec}

class ScoreSpec extends AnyFunSuite {

  test("SmallFloat: identity below 24 (SURVEY §7.5 item 2)") {
    (0 until SmallFloat.NumFreeValues).foreach { v =>
      assert(SmallFloat.intToByte4(v) == v.toByte)
      assert(SmallFloat.byte4ToInt(v.toByte) == v)
    }
    assert(SmallFloat.NumFreeValues == 24)
  }

  test("SmallFloat: encode is monotone non-decreasing") {
    var prev = -1
    var v = 0
    while (v < 3000000) {
      val id = SmallFloat.intToByte4(v) & 0xff
      assert(id >= prev, s"id($v)=$id < $prev")
      prev = id
      v += (if (v < 10000) 1 else 997)
    }
  }

  test("SmallFloat: decode(encode(v)) <= v and idempotent") {
    val rng = new java.util.Random(11)
    (0 until 5000).foreach { _ =>
      val v = rng.nextInt(Int.MaxValue)
      val d = SmallFloat.byte4ToInt(SmallFloat.intToByte4(v))
      assert(d <= v)
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(d)) == d)
    }
    assert((SmallFloat.intToByte4(Int.MaxValue) & 0xff) == 255)
  }

  test("BM25 formula spot values (tantivy 0.21 semantics, SURVEY §2.8)") {
    // idf with df=1, N=2: ln(1 + 1.5/1.5) = ln 2
    assert(math.abs(Bm25.idf(1, 2) - math.log(2).toFloat) < 1e-6)
    // doc with len == avgdl, tf=1: norm = k1, score = idf*(k1+1)*1/(1+k1)= idf
    val cache = Bm25.normCache(10f)
    val id = SmallFloat.intToByte4(10) & 0xff
    val s = Bm25.partial(Bm25.weight(1, 2), 1, cache(id))
    assert(math.abs(s - Bm25.idf(1, 2)) < 1e-6)
  }

  test("posting codec: delta+varint roundtrip (FIXTURES §4)") {
    val rng = new java.util.Random(13)
    (0 until 50).foreach { _ =>
      val n = 1 + rng.nextInt(700)
      var docId = 0L
      val entries = (0 until n).map { _ =>
        docId += 1 + rng.nextInt(100000)
        (docId, 1 + rng.nextInt(500), rng.nextInt(256).toByte)
      }
      val cache = Bm25.normCache(100f)
      val blocks = PostingCodec.encodeRun(entries.iterator, cache)
      assert(blocks.map(_.n).sum == n)
      assert(blocks.forall(_.n <= PostingCodec.BlockSize))
      val decoded = PostingCodec.decodeRun(blocks).toSeq
      assert(decoded == entries)
      // block metadata correct
      blocks.foreach { b =>
        val es = PostingCodec.decodeBlock(b)
        assert(b.firstDocId == es.head._1 && b.lastDocId == es.last._1)
        assert(b.maxTf == es.map(_._2).max)
        val m = es.map { case (_, tf, nid) => Bm25.tfNorm(tf, cache(nid & 0xff)) }.max
        assert(b.maxTfNorm == m)
      }
    }
  }

  test("block bound dominates every entry partial under ANY query avgdl (fuzz)") {
    // the (maxTf, minNormId) query-time bound — with Bm25.BoundSlack —
    // must upper-bound each entry's f32 partial even when the query's
    // normCache (merged avgdl) differs from the build's
    val rng = new scala.util.Random(77)
    for (_ <- 0 until 50) {
      var docId = 0L
      val entries = (0 until 300).map { _ =>
        docId += 1 + rng.nextInt(1000)
        (docId, 1 + rng.nextInt(50), rng.nextInt(256).toByte)
      }
      val buildCache = Bm25.normCache(1f + rng.nextFloat() * 200f)
      val queryCache = Bm25.normCache(1f + rng.nextFloat() * 200f)
      val weight = 0.01f + rng.nextFloat() * 10f
      val blocks = PostingCodec.encodeRun(entries.iterator, buildCache)
      blocks.foreach { b =>
        val bound =
          Bm25.partial(weight, b.maxTf, queryCache(b.minNormId)) *
            Bm25.BoundSlack
        PostingCodec.decodeBlock(b).foreach { case (_, tf, nid) =>
          val p = Bm25.partial(weight, tf, queryCache(nid & 0xff))
          assert(p <= bound, s"partial $p > bound $bound (tf=$tf nid=$nid)")
        }
      }
    }
  }

  test("varint boundaries") {
    Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue).foreach { v =>
      val b = scala.collection.mutable.ArrayBuilder.make[Byte]
      PostingCodec.writeVarLong(v, b)
      val r = new PostingCodec.Reader(b.result())
      assert(r.readVarLong() == v)
    }
  }
}
