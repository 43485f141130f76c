package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token counting, quality scoring, language ID,
  * document fingerprinting.
  *
  * Everything except the language-ID and fingerprint UDFs is built-in
  * Catalyst expressions (regexp/array/aggregate), so the common path is
  * whole-stage-codegen'd and column-pruned; at 100 TB these run as pure
  * map-side work with no shuffle (the only exchange is the final
  * order/aggregation).
  */
object TextOps {

  /** BPE-ish pre-tokenization: letter runs, digit runs, punctuation
    * runs — the standard byte-pair pre-split shape. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  /** Tiny function-word sample used by the quality score (kept small and
    * mirrored literally in the oracle SQL). */
  val StopSample: Seq[String] =
    Seq("the", "a", "of", "to", "in", "and", "is", "on", "for", "with")

  def whitespaceTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** t01: token statistics (whitespace + BPE-ish regex + chars). */
  def t01_token_stats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        size(whitespaceTokens($"text")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all($"text", lit(BpeishPattern), lit(0)))
          .cast("long").as("n_bpeish_tokens"),
        length($"text").cast("long").as("n_chars_measured"),
        $"n_chars")
      .orderBy($"doc_id")
  }

  /** Oracle token list mirroring [[whitespaceTokens]] exactly: DuckDB's
    * `string_split_regex('', …)` yields `['']` (1 token) where the Spark
    * side yields `[]` (0 tokens) for empty/whitespace-only text, flipping
    * every count/ratio/gate built on it. `list_filter(x <> '')` closes
    * the gap and is a no-op for non-empty text (splitting a trimmed
    * non-empty string on `\s+` never produces an empty token). */
  private[graft] def oracleToks(textExpr: String): String =
    s"list_filter(string_split_regex(trim($textExpr), '\\s+'), x -> x <> '')"

  /** The t07 gate verdict as a plain Scala function — EXACTLY the rule
    * the `gateSignals` column formulation applies (same trim/tokenize/
    * punct/3-gram semantics), for contexts where the two-level
    * aggregation plan can't run: a STREAMING pipeline supports only one
    * stateful aggregation, so the per-doc signals must collapse to a
    * map-side UDF (st07). Docs are KB-sized; the per-row work is the
    * same the columnar plan does, minus the (doc_id, gram) shuffle. */
  def gateKeep(text: String): Boolean = {
    import graft.dedup.DedupOps.{sqlTrim, WsPattern}
    val trimmed = sqlTrim(text)
    val toksG: Array[String] =
      if (trimmed.isEmpty) Array.empty else WsPattern.split(trimmed)
    val nTok = toksG.length.toLong
    val nStop = toksG.count(StopSample.contains).toLong
    // CODE POINTS, not UTF-16 units: the columnar t07 counts via
    // regexp_extract_all and length(), which both walk code points — a
    // surrogate-pair emoji is ONE punct char and ONE text char there,
    // where charAt/length would count it twice on both sides of the
    // punct ratio, flipping the verdict on emoji-dense non-BMP text
    var nPunct = 0L
    var nCp = 0L
    var i = 0
    while (i < text.length) {
      val c = text.codePointAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') ||
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (!ok) nPunct += 1
      nCp += 1
      i += Character.charCount(c)
    }
    val nChars = nCp
    // gram path mirrors gateSignals: UNGUARDED split (empty text ⇒ [""])
    val ts = WsPattern.split(trimmed)
    val grams: Seq[String] =
      if (ts.length < 3) Seq(ts.mkString(" "))
      else ts.iterator.sliding(3).map(_.mkString(" ")).toSeq
    val nGrams = grams.length.toLong
    val nDistinct = grams.distinct.length.toLong
    !(nTok < 30 || nStop * 1000 < nTok * 15 || nPunct * 10 > nChars ||
      (nGrams - nDistinct) * 10 > nGrams)
  }

  val t01Oracle: String =
    raw"""SELECT doc_id,
      |  len(${oracleToks("text")}) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS n_bpeish_tokens,
      |  length(text) AS n_chars_measured,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t02: heuristic quality score — length, stopword ratio, mean token
    * length, uppercase/punct ratio. Ratios are single IEEE-double
    * divisions of integer counts, so the oracle matches bit-for-bit. */
  def t02_quality_score(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = whitespaceTokens($"text")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(StopSample: _*))).cast("double")
    val nPunct = size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double")
    Tables.documents(s, d)
      .select($"doc_id",
        (nStop / nTok).as("stop_ratio"),
        (nPunct / length($"text").cast("double")).as("punct_ratio"),
        ((length($"text").cast("double") - (nTok - lit(1.0))) / nTok)
          .as("mean_token_len"))
      .orderBy($"doc_id")
  }

  /** 0/0 on doubles is NaN in Spark but NULL in DuckDB — the CASE arms
    * pin the Spark semantics for empty/whitespace-only docs (n_tok = 0
    * after the empty-token filter, length(text) = 0 for truly empty).
    * mean_token_len's numerator is length − (n_tok − 1) ≥ 1 when
    * n_tok = 0, so ITS zero-division is x/0 = +Infinity, not NaN. */
  val t02Oracle: String =
    raw"""WITH t AS (SELECT doc_id, text,
      |    CAST(len(${oracleToks("text")}) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter(${oracleToks("text")},
      |      x -> x IN ('the','a','of','to','in','and','is','on','for','with'))) AS DOUBLE) AS n_stop,
      |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN n_tok = 0 THEN 'NaN'::DOUBLE ELSE n_stop / n_tok END AS stop_ratio,
      |  CASE WHEN length(text) = 0 THEN 'NaN'::DOUBLE
      |       ELSE n_punct / CAST(length(text) AS DOUBLE) END AS punct_ratio,
      |  CASE WHEN n_tok = 0 THEN 'Infinity'::DOUBLE
      |       ELSE (CAST(length(text) AS DOUBLE) - (n_tok - 1.0)) / n_tok END
      |    AS mean_token_len
      |FROM t ORDER BY doc_id""".stripMargin

  /** t05: Gopher-style repetition metrics — the duplicated-3-gram
    * fraction and the hottest 3-gram's share, the standard boilerplate /
    * low-quality signals for pretraining filters. Pure built-in
    * expressions (transform/sequence/explode + one aggregation), so the
    * gram construction is codegen'd map-side work and the only shuffle
    * is the (doc_id, gram) count. */
  def t05_repetition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, d)
      .select($"doc_id", whitespaceTokens($"text").as("toks"))
      .select($"doc_id", explode(when(size($"toks") >= 3,
        expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))
        .otherwise(array(concat_ws(" ", $"toks")))).as("gram"))
    grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max($"cnt").as("max_gram_count"))
      .select($"doc_id", $"n_grams", $"n_distinct_grams",
        (($"n_grams" - $"n_distinct_grams").cast("double") /
          $"n_grams".cast("double")).as("dup_gram_frac"),
        ($"max_gram_count".cast("double") / $"n_grams".cast("double"))
          .as("top_gram_frac"))
      .orderBy($"doc_id")
  }

  val t05Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
      |         ELSE array_to_string(ts[i:i+2], ' ') END AS gram
      |  FROM toks,
      |    UNNEST(range(1, GREATEST(len(ts) - 1, 2))) AS u(i)),
      |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |  COUNT(*) AS n_distinct_grams,
      |  CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
      |    AS dup_gram_frac,
      |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_gram_frac
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- t03 language ID (n-gram heuristic) ----

  /** Character-trigram + function-word profiles for a handful of
    * languages; scores by profile-hit density. Heuristic — rows-only
    * check (the synthetic corpus shares one vocabulary across langs). */
  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      "ing", "ng ", " to", "to ", "ion", " is", "is "),
    "de" -> Set("der", "er ", " de", "die", "ie ", "und", " un", "sch",
      "ein", " ei", "ich", "ch ", "en ", "ung", " ge"),
    "fr" -> Set(" de", "de ", "le ", " le", "es ", "ent", " la", "la ",
      "et ", " et", "ion", "que", " qu", "ue ", "les"),
    "es" -> Set(" de", "de ", "la ", " la", "el ", " el", "os ", "as ",
      "que", " qu", "ue ", "ión", " en", "en ", "ado"),
    "zh" -> Set.empty)

  /** The scoring languages in sorted order (index = position in the
    * per-trigram hit vectors below). */
  private val scoredLangs: Array[String] =
    langProfiles.collect { case (l, p) if p.nonEmpty => l }.toArray.sorted

  /** All profiles merged into ONE map keyed by the trigram's three chars
    * packed into a Long — one lookup and zero substring allocations per
    * scanned position instead of four Set lookups on a fresh String
    * (every profile trigram is BMP, so a char-level pack is lossless). */
  private val mergedProfile: scala.collection.immutable.LongMap[Array[Int]] = {
    // LongMap: a plain Map[Long, _] would box the key on every .get —
    // one allocation per scanned character corpus-wide
    val m = scala.collection.mutable.Map[Long, List[Int]]()
    scoredLangs.zipWithIndex.foreach { case (lang, li) =>
      langProfiles(lang).foreach { g =>
        val key = (g.charAt(0).toLong << 32) | (g.charAt(1).toLong << 16) | g.charAt(2).toLong
        m(key) = li :: m.getOrElse(key, Nil)
      }
    }
    scala.collection.immutable.LongMap(m.view.mapValues(_.toArray).toSeq: _*)
  }

  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(cp =>
      (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)).count()
    if (cjk * 2 > text.length) return "zh"
    val padded = " " + text.toLowerCase + " "
    val hits = new Array[Int](scoredLangs.length)
    var i = 0
    while (i + 3 <= padded.length) {
      val key = (padded.charAt(i).toLong << 32) |
        (padded.charAt(i + 1).toLong << 16) | padded.charAt(i + 2).toLong
      mergedProfile.get(key) match {
        case Some(ls) =>
          var k = 0
          while (k < ls.length) { hits(ls(k)) += 1; k += 1 }
        case None =>
      }
      i += 1
    }
    // same argmax tie-break as before: max hits, ties to the LARGER lang
    // (scoredLangs is sorted ascending, so iterate with >=)
    var best = 0
    var bi = 1
    while (bi < hits.length) { if (hits(bi) >= hits(best)) best = bi; bi += 1 }
    if (hits(best) == 0) "und" else scoredLangs(best)
  }

  /** t03 oracle: the trigram scan is re-expressed as non-overlapping
    * replace-counting — exact because no profile trigram can overlap
    * itself (none has g[0]==g[2]) — and argmax-by-(hits, lang) matches
    * `detectLang`'s maxBy tuple order. */
  val t03Oracle: String = {
    val profVals = langProfiles.toSeq.sortBy(_._1).collect {
      case (lang, prof) if prof.nonEmpty =>
        prof.toSeq.sorted.map(g => s"('$lang', '${g.replace("'", "''")}')")
          .mkString(",\n    |    ")
    }.mkString(",\n    |    ")
    s"""WITH prof(lang, g) AS (VALUES
      |    $profVals),
      |d AS (
      |  SELECT doc_id, lang AS true_lang, text,
      |    ' ' || lower(text) || ' ' AS padded,
      |    len(regexp_extract_all(text,
      |      '[\\x{4e00}-\\x{9fff}\\x{3400}-\\x{4dbf}]')) AS cjk
      |  FROM documents),
      |hits AS (
      |  SELECT d.doc_id, prof.lang,
      |    SUM((length(d.padded) - length(replace(d.padded, prof.g, ''))) // 3)
      |      AS n_hits
      |  FROM d CROSS JOIN prof
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT doc_id, lang, n_hits,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY n_hits DESC, lang DESC) AS rn
      |  FROM hits),
      |pred AS (
      |  SELECT d.doc_id, d.true_lang,
      |    CASE WHEN length(d.text) = 0 THEN 'und'
      |         WHEN d.cjk * 2 > length(d.text) THEN 'zh'
      |         WHEN b.n_hits = 0 THEN 'und'
      |         ELSE b.lang END AS predicted
      |  FROM d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1)
      |SELECT true_lang AS lang, predicted, COUNT(*) AS n_docs
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  def t03_lang_id(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lid = udf(detectLang _)
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // UDF-bound; spread the single-row-group scan
      .withColumn("predicted", lid($"text"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }

  // ---- t04 fingerprinting (rolling hash / winnowing) ----

  /** 64-bit polynomial rolling hash over whitespace tokens plus a
    * winnowing fingerprint (min hash over each window of `w` token
    * 3-grams) — the standard near-copy detection fingerprint. */
  def fingerprint(text: String): (Long, Long) = {
    // sqlTrim: tokenization must mirror the SQL oracle's trim() exactly
    val toks = graft.dedup.DedupOps.WsPattern
      .split(graft.dedup.DedupOps.sqlTrim(text))
    var h = 1125899906842597L
    toks.foreach { t => h = h * 31 + t.hashCode }
    val grams = toks.sliding(3).map(_.mkString(" ").hashCode.toLong & 0xffffffffL)
    val minGram = if (toks.length < 3) h & 0xffffffffL else grams.min
    (h, minGram)
  }

  def t04_fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fp = udf { text: String => val (a, b) = fingerprint(text); (a, b) }
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("fp", fp($"text"))
      .select($"doc_id", $"fp._1".as("rolling_hash"), $"fp._2".as("min_shingle"))
      .orderBy($"doc_id")
  }

  /** t04 oracle: Java `String.hashCode` (a JLS-specified fold, stable
    * across JVMs for BMP text) re-expressed as modular arithmetic —
    * 32-bit wraparound via `% 2^32` + sign adjust per token, 64-bit
    * wraparound via HUGEINT `% 2^64` for the rolling hash. */
  val t04Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents),
      |tok_h AS (
      |  SELECT doc_id, i,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(split(ts[i], ''), c -> CAST(unicode(c) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 4294967296) AS uh
      |  FROM toks, UNNEST(range(1, len(ts) + 1)) AS u(i)),
      |tok_s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN uh >= 2147483648 THEN uh - 4294967296 ELSE uh END AS sh
      |  FROM tok_h),
      |roll AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        list_transform(list(sh ORDER BY i), x -> CAST(x AS HUGEINT))),
      |      (h, c) -> ((h * 31 + c) % 18446744073709551616
      |                 + 18446744073709551616) % 18446744073709551616) AS uh64
      |  FROM tok_s GROUP BY doc_id),
      |grams AS (
      |  SELECT t.doc_id,
      |    MIN(list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(split(array_to_string(ts[i:i+2], ' '), ''),
      |          c -> CAST(unicode(c) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 4294967296)) AS min_uh
      |  FROM toks t, UNNEST(range(1, GREATEST(len(ts) - 2, 1) + 1)) AS u(i)
      |  WHERE len(ts) >= 3
      |  GROUP BY t.doc_id)
      |SELECT r.doc_id,
      |  CAST(CASE WHEN uh64 >= 9223372036854775808
      |       THEN uh64 - 18446744073709551616 ELSE uh64 END AS BIGINT)
      |    AS rolling_hash,
      |  CAST(COALESCE(g.min_uh, uh64 % 4294967296) AS BIGINT) AS min_shingle
      |FROM roll r LEFT JOIN grams g ON r.doc_id = g.doc_id
      |ORDER BY r.doc_id""".stripMargin

  // ---- t06 PII scrub ----

  /** PII patterns shared verbatim by the Spark plan and the DuckDB
    * oracle — restricted to syntax Java regex and RE2 interpret
    * identically on ASCII (character classes, bounded repetition, `\b`
    * on `[A-Za-z0-9_]` boundaries; no backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** t06: PII scrub — the redaction stage every pretraining pipeline runs
    * before training. The corpus has no PII, so deterministic PII is
    * first INJECTED as a pure function of doc_id (same trick as the dedup
    * planting), then detected and redacted: emails → `<EMAIL>`, phones →
    * `<PHONE>`, IPv4s → `<IP>`, in that fixed order. Pure built-in
    * regexp expressions ⇒ map-side, codegen'd, no shuffle except the
    * final ordering; the oracle re-runs the identical regexes in DuckDB
    * and compares counts AND the md5 of the scrubbed text. */
  def t06_pii_scrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val injected = concat($"text",
      lit(" Contact user"), $"doc_id".cast("string"),
      lit("@mail.example.com or ("),
      lpad(($"doc_id" % 800 + 200).cast("string"), 3, "0"), lit(") 555-"),
      lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
      lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit("."),
      (($"doc_id" * 7) % 256).cast("string"))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(injected, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
    Tables.documents(s, d)
      .select($"doc_id",
        size(regexp_extract_all(injected, lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(injected, lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(injected, lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ips"),
        md5(scrubbed).as("scrubbed_md5"))
      .orderBy($"doc_id")
  }

  val t06Oracle: String =
    """WITH inj AS (
      |  SELECT doc_id, text || ' Contact user' || doc_id
      |    || '@mail.example.com or ('
      |    || lpad(CAST(doc_id % 800 + 200 AS VARCHAR), 3, '0') || ') 555-'
      |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    || ' from 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
      |    AS t
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    AS n_emails,
      |  len(regexp_extract_all(t, '\(\d{3}\) \d{3}-\d{4}')) AS n_phones,
      |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
      |    AS n_ips,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\(\d{3}\) \d{3}-\d{4}', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrubbed_md5
      |FROM inj ORDER BY doc_id""".stripMargin

  // ---- t07 quality gate ----

  /** t07: composite quality GATE — the keep/drop verdict a Gopher-style
    * filter chain ends in, with machine-readable reasons. All rule
    * comparisons are INTEGER cross-multiplications (n_stop·1000 < n_tok·15
    * instead of ratio < 0.015), so the verdict is exact on both engines —
    * no float thresholds to drift. Rules: too_short (< 30 ws tokens),
    * low_stopword (< 1.5% stopwords), high_punct (> 10% punct chars),
    * repetitive (> 10% duplicated 3-grams). Map-side except the 3-gram
    * count (one shuffle, same shape as t05). */
  /** Shared gate-signal frame (t07/t13): per-doc integer counts every
    * rule/feature derives from — token, stopword, punctuation, char, and
    * 3-gram totals. Map-side except the 3-gram count (one shuffle). */
  private def gateSignals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = whitespaceTokens($"text")
    val base = Tables.documents(s, d)
      .select($"doc_id",
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, t => t.isin(StopSample: _*))).cast("long").as("n_stop"),
        size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("long").as("n_punct"),
        length($"text").cast("long").as("n_chars_m"))
    val rep = Tables.documents(s, d)
      .select($"doc_id", whitespaceTokens($"text").as("toks"))
      .select($"doc_id", explode(when(size($"toks") >= 3,
        expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))
        .otherwise(array(concat_ws(" ", $"toks")))).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_grams"), count(lit(1)).as("n_distinct"))
    base.join(rep, "doc_id")
  }

  def t07_quality_gate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tooShort = $"n_tok" < 30
    val lowStop = $"n_stop" * 1000 < $"n_tok" * 15
    val highPunct = $"n_punct" * 10 > $"n_chars_m"
    val repetitive = ($"n_grams" - $"n_distinct") * 10 > $"n_grams"
    gateSignals(s, d)
      .select($"doc_id",
        (!tooShort && !lowStop && !highPunct && !repetitive).as("keep"),
        concat_ws(",",
          when(tooShort, "too_short"),
          when(lowStop, "low_stopword"),
          when(highPunct, "high_punct"),
          when(repetitive, "repetitive")).as("reasons"))
      .orderBy($"doc_id")
  }

  val t07Oracle: String =
    raw"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(${oracleToks("text")}) AS BIGINT) AS n_tok,
      |    CAST(len(list_filter(${oracleToks("text")},
      |      x -> x IN ('the','a','of','to','in','and','is','on','for','with'))) AS BIGINT) AS n_stop,
      |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS n_punct,
      |    CAST(length(text) AS BIGINT) AS n_chars_m
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
      |         ELSE array_to_string(ts[i:i+2], ' ') END AS gram
      |  FROM toks, UNNEST(range(1, GREATEST(len(ts) - 1, 2))) AS u(i)),
      |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |rep AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |          COUNT(*) AS n_distinct
      |        FROM c GROUP BY 1),
      |j AS (SELECT * FROM base JOIN rep USING (doc_id))
      |SELECT doc_id,
      |  NOT (n_tok < 30 OR n_stop * 1000 < n_tok * 15
      |    OR n_punct * 10 > n_chars_m
      |    OR (n_grams - n_distinct) * 10 > n_grams) AS keep,
      |  concat_ws(',',
      |    CASE WHEN n_tok < 30 THEN 'too_short' END,
      |    CASE WHEN n_stop * 1000 < n_tok * 15 THEN 'low_stopword' END,
      |    CASE WHEN n_punct * 10 > n_chars_m THEN 'high_punct' END,
      |    CASE WHEN (n_grams - n_distinct) * 10 > n_grams THEN 'repetitive' END)
      |    AS reasons
      |FROM j ORDER BY doc_id""".stripMargin

  /** t08: corpus TF-IDF — the characteristic terms of every document,
    * the standard "what is this page about / drop boilerplate-dominated
    * docs" signal. Term frequency per (doc, term), document frequency
    * per term across the whole corpus, score = tf·idf with a
    * RECIPROCAL-df idf (score = tf/df): rank-equivalent to any
    * monotone-decreasing idf on a fixed corpus, and — being one
    * correctly-rounded IEEE division of two integers — bit-identical
    * between engines, where `ln(N/df)` could diverge in the last ulp
    * and flip a near-tie (the same determinism rule as q24's stats).
    * Top-3 terms per doc, ties broken by term.
    *
    * Scale shape: tokenize+explode is map-side; tf and df are two keyed
    * aggregations with map-side partials; df joins back on `term` (a
    * shuffle join — the vocabulary is corpus-sized, never broadcast);
    * the top-k window partitions by doc_id. Every exchange is keyed; no
    * global collect anywhere. */
  def t08_tfidf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(whitespaceTokens(lower($"text"))).as("term"))
      .filter($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy(($"tf".cast("double") / $"df".cast("double")).desc, $"term")
    tf.join(df, "term")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tf", $"df",
        ($"tf".cast("double") / $"df".cast("double")).as("score"))
      .orderBy($"doc_id", $"rk")
  }

  val t08Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term <> '' GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |      ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) DESC, t.term)
      |      AS rk
      |  FROM tf t JOIN df d USING (term))
      |SELECT doc_id, rk, term, CAST(tf AS BIGINT) AS tf,
      |  CAST(df AS BIGINT) AS df, score
      |FROM sc WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** t09: corpus-frequency token stats — the unigram-LM-shaped quality
    * signal a pretraining pipeline uses where a real LM is unavailable:
    * how COMMON a document's vocabulary is in its own corpus. Per doc:
    * token count, summed corpus frequency (how often this doc's tokens
    * occur corpus-wide), mean frequency, rare-token fraction (corpus
    * occurrences ≤ 2 — hapax/dis legomena: typos, codes, boilerplate
    * ids), and out-of-vocabulary fraction against the corpus's top-100
    * tokens. All aggregates are INTEGER sums with one final IEEE
    * division each, so the oracle matches bit-for-bit (a double sum's
    * value depends on shuffle merge order — the s04/w08 determinism
    * rule).
    *
    * Scale shape: explode is map-side; term frequency is one keyed agg
    * with map-side partials; the freq table joins back on `term` (a
    * shuffle join — vocabulary-sized, never broadcast); the top-100
    * vocab is a TakeOrdered (k rows to the driver-side limit, then
    * broadcast-joined back by Catalyst since it is 100 rows by
    * construction); final agg shuffles on doc_id. */
  def t09_rare_tokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(whitespaceTokens(lower($"text"))).as("term"))
      .filter($"term" =!= "")
    val freq = toks.groupBy($"term").agg(count(lit(1)).as("cf"))
    // deterministic top-100 vocabulary: ties broken by term
    val vocab = freq.orderBy($"cf".desc, $"term").limit(100)
      .select($"term", lit(1).as("in_vocab"))
    toks.join(freq, "term")
      .join(vocab, Seq("term"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"cf").as("sum_cf"),
        sum(when($"cf" <= 2, 1L).otherwise(0L)).as("n_rare"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens", $"sum_cf",
        ($"sum_cf".cast("double") / $"n_tokens".cast("double")).as("mean_cf"),
        $"n_rare",
        ($"n_rare".cast("double") / $"n_tokens".cast("double")).as("rare_frac"),
        $"n_oov",
        ($"n_oov".cast("double") / $"n_tokens".cast("double")).as("oov_frac"))
      .orderBy($"doc_id")
  }

  val t09Oracle: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |freq AS (SELECT term, COUNT(*) AS cf FROM tk GROUP BY 1),
      |vocab AS (SELECT term FROM freq ORDER BY cf DESC, term LIMIT 100),
      |j AS (
      |  SELECT t.doc_id, f.cf,
      |    CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM tk t JOIN freq f USING (term)
      |    LEFT JOIN vocab v ON v.term = t.term),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(cf) AS BIGINT) AS sum_cf,
      |    CAST(SUM(CASE WHEN cf <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |    CAST(SUM(oov) AS BIGINT) AS n_oov
      |  FROM j GROUP BY 1)
      |SELECT doc_id, n_tokens, sum_cf,
      |  CAST(sum_cf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_cf,
      |  n_rare,
      |  CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS rare_frac,
      |  n_oov,
      |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_frac
      |FROM agg ORDER BY doc_id""".stripMargin

  /** t10: cross-document bigram novelty — the inverse of t05's
    * WITHIN-doc repetition: how much of a document's phrasing appears
    * nowhere else in the corpus. Bigram document frequency is computed
    * corpus-wide; a doc's `novel_frac` is the share of its distinct
    * bigrams with df = 1 (this doc only), and `shared_frac` the share
    * seen in ≥ 10 docs (boilerplate). High shared_frac flags template
    * text that per-doc metrics (t05) cannot see; integer counts + one
    * division keep the oracle exact.
    *
    * Scale shape: same as t08 — bigram construction map-side, (doc,
    * bigram) dedup + df agg are keyed shuffles with partials, df joins
    * back on the bigram (shuffle join, never broadcast), final agg on
    * doc_id. */
  def t10_bigram_novelty(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigrams = Tables.documents(s, d)
      .select($"doc_id", whitespaceTokens(lower($"text")).as("toks"))
      .select($"doc_id", explode(when(size($"toks") >= 2,
        expr("transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', toks[i-1], toks[i]))"))
        .otherwise(array(concat_ws(" ", $"toks")))).as("bg"))
      .distinct()
    val df = bigrams.groupBy($"bg").agg(count(lit(1)).as("bdf"))
    bigrams.join(df, "bg")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_distinct_bigrams"),
        sum(when($"bdf" === 1, 1L).otherwise(0L)).as("n_novel"),
        sum(when($"bdf" >= 10, 1L).otherwise(0L)).as("n_shared10"))
      .select($"doc_id", $"n_distinct_bigrams", $"n_novel",
        ($"n_novel".cast("double") / $"n_distinct_bigrams".cast("double"))
          .as("novel_frac"),
        $"n_shared10",
        ($"n_shared10".cast("double") / $"n_distinct_bigrams".cast("double"))
          .as("shared_frac"))
      .orderBy($"doc_id")
  }

  val t10Oracle: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(ts) < 2 THEN array_to_string(ts, ' ')
      |         ELSE array_to_string(ts[i:i+1], ' ') END AS bg
      |  FROM toks, UNNEST(range(1, GREATEST(len(ts), 2))) AS u(i)),
      |bdf AS (SELECT bg, COUNT(*) AS bdf FROM bg GROUP BY 1),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_distinct_bigrams,
      |    CAST(SUM(CASE WHEN bdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |    CAST(SUM(CASE WHEN bdf >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared10
      |  FROM bg JOIN bdf USING (bg) GROUP BY 1)
      |SELECT doc_id, n_distinct_bigrams, n_novel,
      |  CAST(n_novel AS DOUBLE) / CAST(n_distinct_bigrams AS DOUBLE) AS novel_frac,
      |  n_shared10,
      |  CAST(n_shared10 AS DOUBLE) / CAST(n_distinct_bigrams AS DOUBLE) AS shared_frac
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Apply a learned merge list to a word — standard greedy BPE apply:
    * symbols start as single characters (no end-of-word marker — kept
    * simple and documented), each merge rewrites left-to-right. */
  def bpeSymbols(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          buf += (l + r); i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.result()
    }
    syms
  }

  /** t11: corpus BPE VOCABULARY INDUCTION — the byte-pair-merge loop
    * every tokenizer build runs, expressed map-reduce style: the corpus
    * collapses ONCE to a (word, freq) vocabulary table (one shuffle —
    * after this no iteration ever touches corpus-sized data), then each
    * merge round re-symbolizes the vocabulary under the merges learned
    * so far (map-side UDF over the tiny driver-held merge list),
    * explodes adjacent symbol pairs weighted by word frequency, and
    * accepts a BATCH of top count pairs (ties broken lexicographically,
    * symbol-disjoint within the round — see [[learnBpeMerges]] — so the
    * learned vocabulary is deterministic and round-trips scale as
    * target/batch, not target). 128 merges are learned (or fewer if the
    * corpus exhausts first — every word fused to one symbol). The
    * driver loop is iteration control exactly like d06/w08 — one keyed
    * aggregation per round, one bounded candidate collect per round. No
    * SQL oracle (the merge recurrence is not SQL-expressible) —
    * rows-only at the gate plus a golden pin in DedupGuardSpec. */
  /** The corpus (word, freq) vocabulary table t11/t14 iterate over. */
  private def bpeVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(whitespaceTokens(lower($"text"))).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** The t11 merge-learning loop over a CACHED vocabulary frame, BATCHED
    * (r6 verdict item 5): classic sequential BPE needs one driver
    * round-trip per merge — ~32k Spark jobs at a realistic vocab size.
    * Each round here computes pair counts ONCE and greedily accepts up
    * to `batchM` pairs in (count desc, l, r) order whose symbol sets are
    * pairwise DISJOINT within the round (neither side nor the merged
    * string of an accepted pair may appear in a later acceptance).
    * Disjoint merges commute and cannot create or destroy each other's
    * adjacencies — fusing (c,d) leaves one symbol between any a,b pair,
    * so their counts stay exact under any application order — making
    * each round's picks identical to running those merges sequentially;
    * a pair sharing a symbol is deferred to the next round, where its
    * count is recomputed post-merge. This is the standard batching of
    * scalable BPE trainers: same determinism (total order on
    * (cnt, l, r)), driver round-trips drop from `target` to
    * `target/batch` (~8 per round at character level, more as the
    * symbol alphabet grows). The candidate pool per round is a bounded
    * `4 × batchM`-row collect — iteration control, not data. Returns
    * the picked rows (rank, l, r, merged, count); the merge list is
    * `_2`/`_3`. */
  private def learnBpeMerges(w: DataFrame, target: Int, batchM: Int = 32)
      : Vector[(Int, String, String, String, Long)] = {
    val sp = w.sparkSession
    import sp.implicits._
    var merges = Vector.empty[(String, String)]
    val picked = Vector.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= target && !exhausted) {
      val m = merges
      val symU = udf { word: String => bpeSymbols(word, m) }
      val top = w.select($"freq", symU($"word").as("syms"))
        .select($"freq", explode(when(size($"syms") >= 2,
          expr("transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS l, syms[i] AS r))"))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(4 * batchM).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        var taken = 0
        val it = top.iterator
        while (it.hasNext && taken < batchM && k <= target) {
          val row = it.next()
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          // the merged string is reserved too: a later pair whose side
          // string-equals l+r would also match the instances this merge
          // CREATES, invalidating its pre-batch count
          if (!used(l) && !used(r) && !used(l + r)) {
            used += l; used += r; used += (l + r)
            merges :+= ((l, r))
            picked += ((k, l, r, l + r, c))
            k += 1
            taken += 1
          }
        }
      }
    }
    picked.result()
  }

  def t11_bpe_vocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = graft.dedup.DedupOps.withCache(bpeVocab(s, d)) { w =>
      learnBpeMerges(w, 128).toDF("rank", "left", "right", "merged", "pair_count")
    }
    rows.orderBy($"rank")
  }

  /** t14: BPE ENCODING under the learned merges — the tokenizer
    * APPLICATION stage that follows t11's vocabulary induction (token
    * counting under the actual subword tokenizer is what sizes training
    * runs, not whitespace counts). The merges are learned exactly as in
    * t11 (same deterministic loop), then the corpus token count is
    * computed WITHOUT re-encoding per instance: each DISTINCT word is
    * symbolized once, map-side over the vocabulary table, and instance
    * totals are frequency-weighted sums — corpus-sized data is touched
    * only by the initial vocab shuffle, the same one-collapse shape as
    * t11. Deterministic (merge list + encoder are pure functions) →
    * golden pin; the merge recurrence is not SQL-expressible →
    * rows-only at the gate. */
  def t14_bpe_encode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.dedup.DedupOps.withCache(bpeVocab(s, d)) { w =>
      val merges = learnBpeMerges(w, 128).map(p => (p._2, p._3))
      val symU = udf { word: String => bpeSymbols(word, merges).length }
      w.select($"word", $"freq", symU($"word").as("n_syms"),
          length($"word").cast("long").as("n_chars"))
        .agg(count(lit(1)).as("n_words_distinct"),
          sum($"freq").as("n_word_instances"),
          sum($"freq" * $"n_chars").as("n_chars_total"),
          sum($"freq" * $"n_syms").as("n_bpe_tokens"),
          max($"n_syms").as("max_word_tokens"))
        .select($"n_words_distinct", $"n_word_instances", $"n_chars_total",
          $"n_bpe_tokens", $"max_word_tokens",
          // integer ratio ×1000: chars per BPE token, drift-proof
          expr("(n_chars_total * 1000) div n_bpe_tokens")
            .as("chars_per_token_x1000"))
    }
  }

  // ---- t12 sequence packing ----

  /** t12: SEQUENCE PACKING — the last pipeline stage before training
    * batches: pack quality-gated documents (≥ 30 ws tokens, the t07
    * too_short rule) into fixed-length training sequences (L = 512
    * tokens) by greedy first-fit in deterministic doc_id order,
    * reporting per-group packing efficiency and boundary waste.
    *
    * Greedy packing is inherently sequential (each bin boundary depends
    * on every prior document), so a single global greedy pass cannot
    * be expressed as a window function NOR distributed without a
    * serial scan. The scalable shape: packing restarts at fixed
    * GROUP boundaries (`grp = doc_id div 64`) — groups are packed
    * greedily and independently, one shuffle on grp, each task holding
    * ≤ 64 (doc_id, count) pairs. The group size is the
    * locality/parallelism dial: larger groups amortize boundary waste,
    * smaller groups parallelize more; waste is REPORTED per group
    * precisely so that trade is measurable. Deterministic by
    * construction (fixed boundaries + in-group sort), so the outcome is
    * a pure function of the corpus — unlike a partition-local greedy
    * whose bins would depend on Spark's physical partitioning.
    * A document longer than L gets a bin of its own (counted in
    * `n_oversize`; a real tokenizer-aware pipeline would split it).
    * All emitted columns are integers — no float thresholds to drift
    * cross-engine. Oracle: the same greedy recurrence as a DuckDB
    * recursive CTE (one row per group per step, all groups advance in
    * parallel). */
  /** Greedy first-fit packing of an IN-ORDER token-count sequence into
    * bins of capacity `L`: returns (n_seqs, waste, n_oversize, total).
    * Waste is Σ max(0, L − bin total) over all bins (an over-L
    * single-doc bin wastes nothing — it overflows instead, counted in
    * n_oversize). */
  private[graft] def greedyPack(toks: Seq[Long], L: Long): (Long, Long, Long, Long) = {
    var nSeqs = 0L; var binSum = 0L; var waste = 0L
    var total = 0L; var oversize = 0L
    toks.foreach { t =>
      total += t
      if (t > L) oversize += 1
      if (nSeqs == 0L || binSum + t > L) {
        if (nSeqs > 0L) waste += math.max(0L, L - binSum)
        nSeqs += 1; binSum = t
      } else binSum += t
    }
    if (nSeqs > 0L) waste += math.max(0L, L - binSum)
    (nSeqs, waste, oversize, total)
  }

  def t12_sequence_pack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val L = 512L
    Tables.documents(s, d)
      .select(expr("doc_id div 64").as("grp"), $"doc_id",
        size(whitespaceTokens($"text")).cast("long").as("tok"))
      .filter($"tok" >= 30)
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (grp, it) =>
        val ds = it.map { case (_, id, t) => (id, t) }.toArray.sortBy(_._1)
        val (nSeqs, waste, oversize, total) =
          greedyPack(ds.map(_._2).toSeq, L)
        (grp, ds.length.toLong, total, nSeqs, nSeqs * L, waste, oversize)
      }
      .toDF("grp", "n_docs", "total_tokens", "n_seqs", "capacity",
        "waste_tokens", "n_oversize")
      .orderBy($"grp")
  }

  val t12Oracle: String =
    raw"""WITH RECURSIVE d AS (
      |  SELECT doc_id // 64 AS grp, doc_id,
      |    CAST(len(${oracleToks("text")}) AS BIGINT) AS tok,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS rn
      |  FROM documents
      |  WHERE len(${oracleToks("text")}) >= 30),
      |step(grp, rn, bin_sum, n_seqs, waste) AS (
      |  SELECT grp, rn, tok, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.grp, d.rn,
      |    CASE WHEN s.bin_sum + d.tok > 512 THEN d.tok
      |         ELSE s.bin_sum + d.tok END,
      |    CASE WHEN s.bin_sum + d.tok > 512 THEN s.n_seqs + 1
      |         ELSE s.n_seqs END,
      |    CASE WHEN s.bin_sum + d.tok > 512
      |         THEN s.waste + GREATEST(0, 512 - s.bin_sum)
      |         ELSE s.waste END
      |  FROM step s JOIN d ON d.grp = s.grp AND d.rn = s.rn + 1),
      |fin AS (
      |  SELECT grp, bin_sum, n_seqs, waste,
      |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY rn DESC) AS rk
      |  FROM step),
      |agg AS (
      |  SELECT grp, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |    CAST(SUM(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize
      |  FROM d GROUP BY 1)
      |SELECT a.grp, a.n_docs, a.total_tokens, f.n_seqs,
      |  f.n_seqs * 512 AS capacity,
      |  f.waste + GREATEST(0, 512 - f.bin_sum) AS waste_tokens,
      |  a.n_oversize
      |FROM agg a JOIN fin f ON f.grp = a.grp AND f.rk = 1
      |ORDER BY a.grp""".stripMargin

  // ---- t13 model-based quality scoring ----

  /** t13: MODEL-BASED quality filtering — the classifier stage real
    * curation pipelines run after rule gates (a fastText/logreg model
    * scoring every document): logistic regression over the t07 gate
    * signals, trained with 10 batch-gradient-descent iterations against
    * the rule gate's own keep/drop verdict, then scored corpus-wide and
    * compared back to the labels (confusion counts).
    *
    * Deterministic by the repo's iterative-algorithm discipline
    * (d06/w08/t11): per-doc probabilities use `StrictMath.exp`
    * (bit-identical on every JVM), each doc's gradient contribution is
    * quantized to 2^-32 and summed as LONGS (shuffle-merge-order-proof),
    * and the driver holds only the 5 weights — each iteration is one
    * map-side pass over the cached feature frame ending in a 5-long
    * aggregate (iteration control, not data movement; the feature frame
    * is computed once). At 100 TB the shape is unchanged: training cost
    * is iterations × one scan, scoring is a single map-side pass. Not
    * SQL-expressible (the GD recurrence + exp) → rows-only at the gate
    * plus a golden pin in DedupGuardSpec.
    *
    * Evaluation is HELD OUT (r5 verdict): docs are split by q30's
    * deterministic content-hash rule (first 16 bits of md5(text) mod 10:
    * 8 train / 1 valid / 1 test), GD sees ONLY the train split, and the
    * confusion matrix is computed ONLY on the valid split — so the
    * reported accuracy measures generalization to unseen documents, not
    * memorization of the training rows. The split is content-hashed, so
    * the same doc lands in the same split on every engine and run. */
  def t13_quality_model(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Scale = 4294967296.0 // 2^32 fixed-point quantum (s04/w08 rule)
    val lr = 0.5
    // q30's split rule verbatim — one map-side column, joined on doc_id
    val split = Tables.documents(s, d).select($"doc_id",
      (conv(substring(md5($"text"), 1, 4), 16, 10).cast("long") % 10)
        .as("bucket"))
    val feats = gateSignals(s, d).join(split, "doc_id").select($"doc_id",
      $"bucket",
      // O(1)-scaled features, integer-exact guards for empty docs; f1 is
      // CENTERED on the too_short boundary (30 tokens) so the dominant
      // rule is linearly separable through the origin
      (($"n_tok" - 30).cast("double") / 30.0).as("f1"),
      when($"n_tok" === 0, 0.0)
        .otherwise($"n_stop".cast("double") / $"n_tok".cast("double")).as("f2"),
      when($"n_chars_m" === 0, 0.0)
        .otherwise($"n_punct".cast("double") / $"n_chars_m".cast("double")).as("f3"),
      (($"n_grams" - $"n_distinct").cast("double") / $"n_grams".cast("double"))
        .as("f4"),
      when($"n_tok" >= 30 && !($"n_stop" * 1000 < $"n_tok" * 15) &&
        !($"n_punct" * 10 > $"n_chars_m") &&
        !(($"n_grams" - $"n_distinct") * 10 > $"n_grams"), 1.0)
        .otherwise(0.0).as("y"))
    graft.dedup.DedupOps.withCache(feats) { f =>
      val train = f.filter($"bucket" < 8)
      val valid = f.filter($"bucket" === 8)
      var w = Array.fill(5)(0.0)
      // scoring column: left-to-right double arithmetic identical to the
      // former UDF's, with the exp inside whole-stage codegen via the
      // StrictSigmoid expression (built-in exp() is Math.exp, whose
      // platform intrinsic could shift the pinned weights by ulps)
      def p(wv: Array[Double]) = graft.functions.GraftFunctions.strict_sigmoid(
        lit(wv(0)) + lit(wv(1)) * $"f1" + lit(wv(2)) * $"f2" +
          lit(wv(3)) * $"f3" + lit(wv(4)) * $"f4")
      (1 to 30).foreach { _ =>
        val r = train.withColumn("e", p(w) - $"y")
          .agg(
            sum(($"e" * Scale).cast("long")).as("g0"),
            sum(($"e" * $"f1" * Scale).cast("long")).as("g1"),
            sum(($"e" * $"f2" * Scale).cast("long")).as("g2"),
            sum(($"e" * $"f3" * Scale).cast("long")).as("g3"),
            sum(($"e" * $"f4" * Scale).cast("long")).as("g4"),
            count(lit(1)).as("n"))
          .head()
        val n = r.getLong(5).toDouble
        w = w.zipWithIndex.map { case (wi, i) =>
          wi - lr * (r.getLong(i).toDouble / (n * Scale))
        }
      }
      val wv = w
      // scored output = VALID split only: no train row contributes to the
      // reported confusion (train count rides along for the split audit)
      valid.withColumn("p", p(wv))
        .agg(count(lit(1)).as("n_valid"),
          sum(when($"y" === 1.0, 1L).otherwise(0L)).as("n_keep"),
          sum(when($"p" >= 0.5 && $"y" === 1.0, 1L).otherwise(0L)).as("tp"),
          sum(when($"p" >= 0.5 && $"y" === 0.0, 1L).otherwise(0L)).as("fp"),
          sum(when($"p" < 0.5 && $"y" === 0.0, 1L).otherwise(0L)).as("tn"),
          sum(when($"p" < 0.5 && $"y" === 1.0, 1L).otherwise(0L)).as("fn"))
        .crossJoin(train.agg(count(lit(1)).as("n_train")))
        .select($"n_train", $"n_valid", $"n_keep", $"tp", $"fp", $"tn", $"fn",
          lit(wv(0)).as("w0"), lit(wv(1)).as("w1"), lit(wv(2)).as("w2"),
          lit(wv(3)).as("w3"), lit(wv(4)).as("w4"))
    }
  }

  /** t15: deterministic GLOBAL SHUFFLE + training-shard layout — the
    * last layout decision before shards hit disk: training-data order
    * affects the model, so the shuffle must be REPRODUCIBLE (same
    * corpus ⇒ same order, engine- and partitioning-independent), and
    * sharding must balance without coordination. Order key =
    * md5('shuf1:' || doc_id) (salted so the order is unrelated to id
    * order and re-saltable per epoch); shard = first 16 bits mod 16.
    * At scale this is `repartition(shard)` + `sortWithinPartitions
    * (order_key)` + a partitioned write — one hash shuffle, per-shard
    * local sorts, no global sort. The output pins the layout exactly:
    * per-shard doc/token counts (balance), min/max order key
    * (boundaries), and an ORDER CHECKSUM Σ doc_id·rank over the
    * within-shard rank — any engine that shuffles into any other order
    * produces a different checksum, so the oracle compare certifies
    * the exact order, not just membership. */
  def t15_shard_layout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit("shuf1:"), $"doc_id".cast("string")))
    val docs = Tables.documents(s, d)
      .select($"doc_id", size(whitespaceTokens($"text")).cast("long").as("n_tok"))
      .withColumn("order_key", key)
      .withColumn("shard",
        (conv(substring($"order_key", 1, 4), 16, 10).cast("long") % 16).as("shard"))
    val ranked = docs.withColumn("rank",
      row_number().over(Window.partitionBy($"shard").orderBy($"order_key", $"doc_id"))
        .cast("long"))
    ranked.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        min($"order_key").as("first_key"),
        max($"order_key").as("last_key"),
        sum($"doc_id" * $"rank").as("order_checksum"))
      .orderBy($"shard")
  }

  val t15Oracle: String =
    """WITH k AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS n_tok,
      |    md5('shuf1:' || CAST(doc_id AS VARCHAR)) AS order_key
      |  FROM documents),
      |sh AS (
      |  SELECT *, CAST(concat('0x', substr(order_key, 1, 4)) AS BIGINT) % 16
      |    AS shard
      |  FROM k),
      |r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY shard
      |    ORDER BY order_key, doc_id) AS BIGINT) AS rank
      |  FROM sh)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  MIN(order_key) AS first_key, MAX(order_key) AS last_key,
      |  CAST(SUM(doc_id * rank) AS BIGINT) AS order_checksum
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t15_shard_layout" -> (t15_shard_layout _),
    "t14_bpe_encode" -> (t14_bpe_encode _),
    "t13_quality_model" -> (t13_quality_model _),
    "t12_sequence_pack" -> (t12_sequence_pack _),
    "t11_bpe_vocab" -> (t11_bpe_vocab _),
    "t09_rare_tokens" -> (t09_rare_tokens _),
    "t10_bigram_novelty" -> (t10_bigram_novelty _),
    "t08_tfidf" -> (t08_tfidf _),
    "t01_token_stats" -> (t01_token_stats _),
    "t02_quality_score" -> (t02_quality_score _),
    "t03_lang_id" -> (t03_lang_id _),
    "t04_fingerprint" -> (t04_fingerprint _),
    "t05_repetition" -> (t05_repetition _),
    "t06_pii_scrub" -> (t06_pii_scrub _),
    "t07_quality_gate" -> (t07_quality_gate _),
  )

  val oracle: Map[String, String] = Map(
    "t15_shard_layout" -> t15Oracle,
    "t12_sequence_pack" -> t12Oracle,
    "t09_rare_tokens" -> t09Oracle,
    "t10_bigram_novelty" -> t10Oracle,
    "t08_tfidf" -> t08Oracle,
    "t01_token_stats" -> t01Oracle,
    "t02_quality_score" -> t02Oracle,
    "t03_lang_id" -> t03Oracle,
    "t04_fingerprint" -> t04Oracle,
    "t05_repetition" -> t05Oracle,
    "t06_pii_scrub" -> t06Oracle,
    "t07_quality_gate" -> t07Oracle,
  )
}
