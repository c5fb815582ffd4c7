package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tokenize.CodeTokenizer._

class CodeTokenizerSpec extends AnyFunSuite {

  test("tokenize == tokenizeCased.map(lowerToken): split boundaries ignore " +
       "case (the one-scan index-build identity, round-4 review)") {
    val samples = Seq("parseHTTPResponse utf8_reader", "FooBar Baz_Qux 99x",
      "", "ALLCAPS mixedCase snake_case __dunder__", "überStraße Grüße",
      "a1B2c3 XMLHttpRequest IOError")
    samples.foreach { s =>
      val viaLower = graft.tokenize.CodeTokenizer.tokenizeCased(s)
        .map(graft.tokenize.CodeTokenizer.lowerToken).toSeq
      assert(graft.tokenize.CodeTokenizer.tokenize(s).toSeq == viaLower, s)
    }
    // lowerToken returns the same reference when nothing changes
    val t = "already_lower"
    assert(graft.tokenize.CodeTokenizer.lowerToken(t) eq t)
  }

  /** deterministic fuzz corpus: printable-ascii strings */
  private def fuzzStrings(n: Int): Seq[String] = {
    val rng = new java.util.Random(7)
    (0 until n).map { _ =>
      val len = rng.nextInt(60)
      new String(Array.fill(len)((32 + rng.nextInt(95)).toChar))
    }
  }

  test("camelCase splits (FIXTURES §4 golden)") {
    assert(tokenize("parseHTTPResponse").toSeq == Seq("parse", "http", "response"))
    assert(tokenize("snake_case_id").toSeq == Seq("snake", "case", "id"))
    assert(tokenize("XMLHttpRequest").toSeq == Seq("xml", "http", "request"))
    assert(tokenize("simpleWord").toSeq == Seq("simple", "word"))
  }

  test("separators and digits") {
    assert(tokenize("foo.bar(baz)").toSeq == Seq("foo", "bar", "baz"))
    assert(tokenize("utf8_decode").toSeq == Seq("utf8", "decode"))
    assert(tokenize("a2B").toSeq == Seq("a2", "b"))
    assert(tokenize("").toSeq == Seq())
    assert(tokenize("___").toSeq == Seq())
    assert(tokenize("if (x) { return y; }").toSeq == Seq("if", "x", "return", "y"))
  }

  test("trigram goldens (reference query/compiler.rs test_trigrams, :320-339)") {
    assert(trigrams("abcde").toSeq == Seq("abc", "bcd", "cde"))
    assert(trigrams("abc").toSeq == Seq("abc"))
    assert(trigrams("ab").toSeq == Seq("ab"))
    assert(trigrams("a").toSeq == Seq("a"))
    assert(trigrams("").toSeq == Seq())
    assert(trigrams("ab㐀de").toSeq == Seq("ab㐀", "b㐀d", "㐀de"))
  }

  test("case permutations golden ORDER (reference compiler.rs test_case_permutations)") {
    assert(casePermutations("abc") ==
      Seq("abc", "Abc", "aBc", "ABc", "abC", "AbC", "aBC", "ABC"))
    assert(casePermutations("ab") == Seq("ab", "Ab", "aB", "AB"))
    assert(casePermutations("a") == Seq("a", "A"))
    assert(casePermutations("") == Seq(""))
    assert(casePermutations("a㐀") == Seq("a㐀", "A㐀"))
    assert(casePermutations("a㐀b") == Seq("a㐀b", "A㐀b", "a㐀B", "A㐀B"))
    assert(casePermutations("a1") == Seq("a1", "A1"))
    // >5 caseable chars: no expansion (cap at compiler.rs:22)
    assert(casePermutations("abcdef") == Seq("abcdef"))
  }

  test("NUL trigram windows (code 0) survive the LongSet (regression)") {
    // "\\0\\0\\0" packs to code 0 --- used to inflate LongSet.size without
    // storing, leaving null slots / duplicate GramBucket rows that crashed
    // the postings encoder on binary-ish content
    val s = "a" + "\u0000\u0000\u0000\u0000" + "b"
    val strs = distinctTrigrams(s)
    assert(!strs.contains(null), s"null slots: ${strs.toSeq}")
    assert(strs.length == strs.distinct.length)
    val codes = distinctTrigramCodes(s)
    assert(codes.length == codes.distinct.length)
    assert(codes.length == strs.length)
    assert(codes.map(decodeTrigram).toSet == strs.toSet)
  }

  test("packed trigram codes roundtrip to the string trigram set (fuzz)") {
    (fuzzStrings(300) ++ Seq("", "a", "ab", "abc", "AbCd", "x y z")).foreach { s =>
      val strs = distinctTrigrams(s).toSet
      val decoded = distinctTrigramCodes(s).map(decodeTrigram).toSet
      assert(decoded == strs, s"mismatch for '$s'")
      val prefixed = distinctTrigrams(s, "g:").toSet
      assert(prefixed == strs.map("g:" + _))
    }
  }

  test("tokenize is deterministic and always lowercase (fuzz)") {
    fuzzStrings(500).foreach { s =>
      val a = tokenize(s)
      assert(a.toSeq == tokenize(s).toSeq)
      assert(a.forall(t => t == t.toLowerCase && t.nonEmpty))
    }
  }

  test("termFreqs sums to token count (fuzz)") {
    fuzzStrings(500).foreach { s =>
      val (tf, len) = termFreqs(s)
      assert(tf.values.sum == len)
      assert(len == tokenize(s).length)
    }
  }

  test("single-spaced lowercase word text tokenizes to exactly its words " +
       "(basis of the driver's e_* DuckDB string_split oracles)") {
    val t = "key agg row scan slow fast merge join a the value part"
    assert(tokenize(t).toSeq == t.split(" ").toSeq)
  }
}
