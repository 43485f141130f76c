package graft.rake

/** RAKE (Rapid Automatic Keyword Extraction) — per-document keyword
  * scoring (SURVEY.md §2.5; reference `src/rake/` which vendors the
  * published RAKE algorithm, Rose et al. 2010).
  *
  * Semantics reproduced (A1–A5):
  *  - A1 phrase segmentation: text split into fragments at punctuation
  *    (hyphen excluded unless whitespace-surrounded, reference
  *    `rake/rake.rs:14`), fragments split into candidate phrases at
  *    stopwords.
  *  - F7 number filter: tokens CONTAINING a match of
  *    `-?\p{N}+[./٫,']?\p{N}*` (substring search, `is_match` — so
  *    "v2"/"abc123" count as numbers) are excluded from
  *    frequency/degree/scoring (`rake/inner.rs:4-14`).
  *  - A2 word stats: with len = count of non-number words in the
  *    phrase, when len > 0: freq(w) += 1, degree(w) += len - 1;
  *    score(w) = (degree + freq) / freq. Tokens keep ORIGINAL case
  *    (only the stopword lookup lowercases), matching
  *    `rake/rake.rs` `phrases()`/`word_scores()`.
  *  - A3 phrase score: sum of member word scores; duplicate phrases
  *    collapse (equal scores, order-insensitive).
  *  - A5 output: Map(phrase → score) with f64→f32 cast
  *    (`src/lib.rs:386-399`).
  *
  * Engine integration: exposed as a deterministic scalar UDF; the
  * stopword set is a JVM-static singleton per executor (the reference
  * uses a process-wide lazy `Rake` instance, `src/lib.rs:385`).
  */
object Rake {

  private val SentenceSplit =
    java.util.regex.Pattern.compile("[\\p{IsPunctuation}&&[^-]]|\\s+-\\s+")
  private val NumberRe =
    java.util.regex.Pattern.compile("-?\\p{N}+[./٫,']?\\p{N}*")

  def isNumber(w: String): Boolean = NumberRe.matcher(w).find()

  /** Candidate phrases: runs of consecutive non-stopwords within each
    * punctuation-delimited fragment. */
  def candidatePhrases(text: String, stop: Set[String]): Seq[Vector[String]] = {
    val out = Seq.newBuilder[Vector[String]]
    val frags = SentenceSplit.split(text)
    var i = 0
    while (i < frags.length) {
      val words = graft.dedup.DedupOps.WsPattern.split(frags(i))
      var cur = Vector.newBuilder[String]
      var curN = 0
      var j = 0
      while (j < words.length) {
        val w = words(j).trim // original case kept, as the reference does
        if (w.isEmpty || stop.contains(w.toLowerCase)) {
          if (curN > 0) { out += cur.result(); cur = Vector.newBuilder[String]; curN = 0 }
        } else { cur += w; curN += 1 }
        j += 1
      }
      if (curN > 0) out += cur.result()
      i += 1
    }
    out.result()
  }

  /** Full RAKE: phrase → score map. */
  def keywords(text: String, stop: Set[String] = Stopwords.english): Map[String, Float] = {
    if (text == null || text.isEmpty) return Map.empty
    val phrases = candidatePhrases(text, stop)
    // A2: word frequency + degree over non-number words
    val freq = collection.mutable.HashMap[String, Int]()
    val degree = collection.mutable.HashMap[String, Int]()
    phrases.foreach { p =>
      val scorable = p.filterNot(isNumber)
      if (scorable.nonEmpty) {
        val deg = scorable.length - 1 // non-number words only, per reference
        scorable.foreach { w =>
          freq.update(w, freq.getOrElse(w, 0) + 1)
          degree.update(w, degree.getOrElse(w, 0) + deg)
        }
      }
    }
    def wordScore(w: String): Double = {
      val f = freq.getOrElse(w, 0)
      if (f == 0) 0.0 else (degree(w).toDouble + f) / f
    }
    // A3+A5: phrase scores into a map (duplicates collapse, scores equal)
    phrases.iterator.map { p =>
      val key = p.mkString(" ")
      val score = p.iterator.filterNot(isNumber).map(wordScore).sum
      key -> score.toFloat
    }.toMap
  }

  /** Ranked (phrase, score) descending — the reference's A4 sort shape
    * (`rake/keyword.rs:28-54`); ties broken by phrase for determinism. */
  def rankedKeywords(text: String, stop: Set[String] = Stopwords.english): Seq[(String, Float)] =
    keywords(text, stop).toSeq.sortBy { case (k, s) => (-s, k) }
}
