package graft

/** Component-level thread-scaling microbenchmark for the postings map side
  * (not a test; Test/runMain graft.TokenizeMicrobench).
  */
object TokenizeMicrobench {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 2000).map { i =>
      graft.corpus.CorpusGen.genRow(42L, 10, 200, i.toLong)._5
    }
    def bench(name: String, f: String => Int): Unit = {
      docs.foreach(f) // warmup
      for (threads <- Seq(1, 8)) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val t0 = System.nanoTime()
        val futs = (0 until threads).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = docs.map(f).sum
          })
        }
        futs.foreach(_.get())
        pool.shutdown()
        val dt = (System.nanoTime() - t0) / 1e9
        val rate = docs.size.toLong * threads / dt
        println(f"$name%-12s threads=$threads%2d docs/s=$rate%8.0f per-thread=${rate / threads}%7.0f")
      }
    }
    bench("tokenize", d => graft.tokenize.CodeTokenizer.tokenize(d).length)
    bench("termFreqs", d => graft.tokenize.CodeTokenizer.termFreqArrays(d)._3)
    bench("trigrams", d => graft.tokenize.CodeTokenizer.distinctTrigrams(d, "g:").length)
    bench("symbols", d => graft.tokenize.SymbolExtractor.symbolTerms(d).length)
    bench("full", { d =>
      // string namespaces + the packed-gram surface the build actually runs
      val it = graft.index.IndexBuilder.tokenizeDoc(1L, d,
        graft.score.SmallFloat.intToByte4(100), lang = "rust")
      var n = 0
      while (it.hasNext) { it.next(); n += 1 }
      n + graft.tokenize.CodeTokenizer.distinctTrigramCodes(d).length
    })
  }
}
