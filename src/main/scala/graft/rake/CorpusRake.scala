package graft.rake

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level RAKE: word frequency/degree aggregated across ALL
  * documents (the reference's RAKE is strictly per-document,
  * `src/lib.rs:386-399`; this is the SURVEY §2.7 extension — a typed
  * `Aggregator` so the merge is associative and map-side partial:
  * each partition folds its documents into one stats map, executors
  * merge maps, and only |vocabulary|-sized state crosses the wire).
  */
object CorpusRakeAgg {

  type Buf = mutable.HashMap[String, (Long, Long)] // word -> (freq, degree)

  val aggregator: Aggregator[String, Buf, Map[String, Float]] =
    new Aggregator[String, Buf, Map[String, Float]] {
      def zero: Buf = mutable.HashMap.empty

      def reduce(buf: Buf, text: String): Buf = {
        if (text != null && text.nonEmpty) {
          Rake.candidatePhrases(text, Stopwords.english).foreach { p =>
            val scorable = p.filterNot(Rake.isNumber)
            val deg = (scorable.length - 1).toLong // non-number words only
            scorable.foreach { w =>
              val (f, dg) = buf.getOrElse(w, (0L, 0L))
              buf.update(w, (f + 1, dg + deg))
            }
          }
        }
        buf
      }

      def merge(a: Buf, b: Buf): Buf = {
        val (small, big) = if (a.size < b.size) (a, b) else (b, a)
        small.foreach { case (w, (f, dg)) =>
          val (f2, dg2) = big.getOrElse(w, (0L, 0L))
          big.update(w, (f + f2, dg + dg2))
        }
        big
      }

      def finish(buf: Buf): Map[String, Float] =
        buf.iterator.map { case (w, (f, dg)) =>
          w -> ((dg.toDouble + f) / f).toFloat
        }.toMap

      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Map[String, Float]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
