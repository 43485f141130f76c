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
    val nStop = stopCount(toks).cast("double")
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
  private[graft] def gateSignals(s: SparkSession, d: String): DataFrame =
    gateSignalsOf(Tables.documents(s, d))

  /** [[gateSignals]] over a caller-supplied `(doc_id, text)` frame — the
    * gate rule applied to a NON-`documents` corpus (p02 runs it on the
    * WARC-extracted text). One definition of the signal math. */
  /** Occurrence count of the sample stopwords in `toks`, LAMBDA-FREE:
    * Σ over the 10 words of (len − len after array_remove(w)) ≡ what
    * `filter(toks, t => t.isin(StopSample))` counts. The higher-order
    * `filter` mis-evaluated (deterministically 0) when the frame sat on
    * p02's WARC-parse lineage — a lambda-binding hazard the pure
    * size/array_remove algebra cannot hit, and this form stays inside
    * whole-stage codegen (lambda HOFs don't). One definition for every
    * stopword-ratio consumer (gate signals, t02, t16). */
  private[graft] def stopCount(toks: Column): Column =
    StopSample.map(w => size(toks) - size(array_remove(toks, w)))
      .reduce(_ + _)

  private[graft] def gateSignalsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = whitespaceTokens($"text")
    val nStop = stopCount(toks)
    val base = docs
      .select($"doc_id",
        size(toks).cast("long").as("n_tok"),
        nStop.cast("long").as("n_stop"),
        size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("long").as("n_punct"),
        length($"text").cast("long").as("n_chars_m"))
    val rep = docs
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

  /** The [[gateSignals]] frame in SQL — CTEs `base`/`toks`/`g`/`c`/`rep`
    * (join base×rep on doc_id for the full signal row). Shared by the
    * t07 oracle, t13's GD-replay oracle, and (via [[gateSignalsSqlCtesFrom]])
    * the p01/p02 pipeline oracles. */
  private[graft] val gateSignalsSqlCtes: String = gateSignalsSqlCtesFrom("documents")

  /** [[gateSignalsSqlCtes]] over a caller-named `(doc_id, text)` CTE —
    * the SQL twin of [[gateSignalsOf]]. */
  private[graft] def gateSignalsSqlCtesFrom(src: String): String =
    raw"""base AS (
      |  SELECT doc_id,
      |    CAST(len(${oracleToks("text")}) AS BIGINT) AS n_tok,
      |    CAST(len(list_filter(${oracleToks("text")},
      |      x -> x IN ('the','a','of','to','in','and','is','on','for','with'))) AS BIGINT) AS n_stop,
      |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS n_punct,
      |    CAST(length(text) AS BIGINT) AS n_chars_m
      |  FROM $src),
      |toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM $src),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
      |         ELSE array_to_string(ts[i:i+2], ' ') END AS gram
      |  FROM toks, UNNEST(range(1, GREATEST(len(ts) - 1, 2))) AS u(i)),
      |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |rep AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |          COUNT(*) AS n_distinct
      |        FROM c GROUP BY 1)""".stripMargin

  val t07Oracle: String =
    s"""WITH $gateSignalsSqlCtes,
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

  /** t19: OVERLAPPING TOKEN-WINDOW CHUNKING — the "split long documents
    * into fixed-size windows with stride" primitive every RAG/embedding
    * pipeline runs before encoding (and long-context training data prep
    * runs before packing). t12/p04 PACK short docs INTO sequences; this
    * is the complement — ONE long doc fans out into `ceil((n−W)/S)+1`
    * windows of W tokens at stride S (W−S overlap), the final window
    * clamped to the doc tail, a ≤W doc staying whole. Per chunk: index,
    * token count, and the md5 of the rebuilt chunk text — so the oracle
    * certifies every window's exact CONTENT and boundary, not just
    * counts. W=32/S=24 here so the fixture corpus (docs mostly 40–120
    * tokens) genuinely exercises multi-chunk fan-out, the overlap, and
    * the clamped tail — at W=128 every test doc stayed whole and the
    * stride path was dead code; production callers dial W/S to their
    * encoder's context.
    *
    * Scale shape: pure map-side codegen'd array work — tokenize once,
    * explode `sequence(0, nc−1)`, slice per index; zero shuffles except
    * the presentation sort. Output rows = Σ chunks (≈ corpus_tokens/S),
    * linear by construction — the 100 TB plan is the same plan. */
  def t19_chunk_windows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = 32
    val S = 24
    val toksd = graft.analytics.Tables.documents(s, d)
      .select($"doc_id", whitespaceTokens($"text").as("toks"))
      .withColumn("n", size($"toks").cast("long"))
    // ceil((n−W)/S)+1 via a double product of small ints — IEEE-exact
    // and identical in DuckDB (integer div differs on negatives; this
    // never goes negative but the double form needs no case analysis)
    val nc = when($"n" <= W, lit(1L))
      .otherwise(ceil(($"n" - W).cast("double") / S).cast("long") + 1L)
    toksd.withColumn("nc", nc)
      .select($"doc_id", $"toks",
        explode(sequence(lit(0L), $"nc" - 1L)).as("chunk_idx"))
      .withColumn("chunk",
        slice($"toks", ($"chunk_idx" * S + 1L).cast("int"), lit(W)))
      .select($"doc_id", $"chunk_idx",
        size($"chunk").cast("long").as("n_chunk_tok"),
        md5(array_join($"chunk", " ")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  // empty guard: DuckDB's string_split_regex('', …) yields [''] (len 1)
  // where whitespaceTokens yields [] — an empty doc entering the corpus
  // would mismatch n_chunk_tok/chunk_md5 without the CASE (r15 ADVICE)
  val t19Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN []
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    CASE WHEN len(toks) <= 32 THEN 1
      |         ELSE CAST(CEIL(CAST(len(toks) - 32 AS DOUBLE) / 24) AS BIGINT) + 1
      |    END AS nc
      |  FROM t),
      |w AS (
      |  SELECT doc_id, toks, CAST(ci AS BIGINT) AS chunk_idx,
      |    toks[ci * 24 + 1 : ci * 24 + 32] AS chunk
      |  FROM c, UNNEST(range(0, nc)) AS u(ci))
      |SELECT doc_id, chunk_idx,
      |  CAST(len(chunk) AS BIGINT) AS n_chunk_tok,
      |  md5(array_to_string(chunk, ' ')) AS chunk_md5
      |FROM w ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t19_chunk_windows" -> (t19_chunk_windows _),
    "t15_shard_layout" -> (t15_shard_layout _),
    "t09_rare_tokens" -> (t09_rare_tokens _),
    "t10_bigram_novelty" -> (t10_bigram_novelty _),
    "t08_tfidf" -> (t08_tfidf _),
    "t01_token_stats" -> (t01_token_stats _),
    "t02_quality_score" -> (t02_quality_score _),
    "t04_fingerprint" -> (t04_fingerprint _),
    "t05_repetition" -> (t05_repetition _),
    "t06_pii_scrub" -> (t06_pii_scrub _),
    "t07_quality_gate" -> (t07_quality_gate _),
  )

  val oracle: Map[String, String] = Map(
    "t19_chunk_windows" -> t19Oracle,
    "t15_shard_layout" -> t15Oracle,
    "t09_rare_tokens" -> t09Oracle,
    "t10_bigram_novelty" -> t10Oracle,
    "t08_tfidf" -> t08Oracle,
    "t01_token_stats" -> t01Oracle,
    "t02_quality_score" -> t02Oracle,
    "t04_fingerprint" -> t04Oracle,
    "t05_repetition" -> t05Oracle,
    "t06_pii_scrub" -> t06Oracle,
    "t07_quality_gate" -> t07Oracle,
  )
}
