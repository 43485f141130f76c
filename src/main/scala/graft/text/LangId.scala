package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import TextOps._

/** N-gram-profile language identification (t03), split out of TextOps
  * (r9 verdict item 4). */
object LangId {

  /** Character-trigram + function-word profiles for a handful of
    * languages; scores by profile-hit density. Heuristic, but
    * oracle-checked ([[t03Oracle]] replays the trigram scan). */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t03_lang_id" -> (t03_lang_id _))

  val oracle: Map[String, String] = Map(
    "t03_lang_id" -> t03Oracle)
}
