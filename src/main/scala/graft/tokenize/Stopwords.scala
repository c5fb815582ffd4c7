package graft.tokenize

/** Stopword removal (T4) — mirror of the reference's
  * `remove_stopwords` (server/bleep/src/query/stopwords.rs:48-72, list
  * from query/stopwords.txt): the text splits into segments at any char
  * outside [a-zA-Z0-9_/ -]; within a segment, words (whitespace-split)
  * accumulate into phrases that a stopword (case-insensitive match)
  * terminates; the result is every phrase word joined by single spaces.
  *
  * The 571-word list lives in the generated [[StopwordData]];
  * StopwordsSpec asserts parity with the reference data file.
  */
object Stopwords {

  val All: Set[String] = StopwordData.Words

  def isStopword(w: String): Boolean = All.contains(w.toLowerCase)

  /** Sequences of consecutive non-stopwords (the reference's `phrases`,
    * adapted from rake-rs).
    */
  def phrases(segments: Iterable[String]): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    segments.filter(_.nonEmpty).foreach { s =>
      var phrase = Vector.newBuilder[String]
      var nonEmpty = false
      s.split("\\s+").filter(_.nonEmpty).foreach { word =>
        if (isStopword(word)) {
          if (nonEmpty) {
            out += phrase.result()
            phrase = Vector.newBuilder[String]
            nonEmpty = false
          }
        } else {
          phrase += word
          nonEmpty = true
        }
      }
      if (nonEmpty) out += phrase.result()
    }
    out.result()
  }

  def removeStopwords(text: String): String =
    phrases(text.split("[^a-zA-Z0-9_/ -]").toSeq).flatten.mkString(" ")
}
