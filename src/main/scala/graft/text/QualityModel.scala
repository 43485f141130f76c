package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import TextOps._

/** Model-based quality scoring (t13), split out of TextOps (r9 verdict
  * item 4). */
object QualityModel {

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t13_quality_model" -> (t13_quality_model _))

  val oracle: Map[String, String] = Map.empty
}
