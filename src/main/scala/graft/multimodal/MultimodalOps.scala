package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, batch decode / feature
  * extraction / resize / frame sampling.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below): it derives "dimensions",
  * "frames" and a checksum feature purely from the bytes. Everything
  * around it — binary column handling, metadata struct schema, batched
  * per-partition processing (the JVM twin of `mapInPandas` batch shape),
  * explode of sampled frames — is real Spark plumbing, partitioned and
  * tested. Swapping the fake for a real codec is a one-function change.
  */
object MultimodalOps {

  /** STUB decoder — deterministic fake standing in for an image codec.
    * Real implementation would parse the container format here. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val n = bytes.length
    val width = (n % 640) + 16
    val height = ((n * 7) % 480) + 16
    val nFrames = n / 256 + 1
    var checksum = 0L
    var i = 0
    while (i < n) { checksum += bytes(i) & 0xff; i += 1 }
    (width, height, nFrames, checksum)
  }

  /** m01: binary ingestion + batched decode + resize. The binary column
    * is synthesized from `documents.text` bytes (UTF-8) so the oracle can
    * recompute every derived value from the base table. */
  def m01_media_decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"),
        encode($"text", "UTF-8").as("content"),
        struct(lit("image/fake").as("mime"), $"source".as("origin"))
          .as("meta"))
    // batched per-partition decode (mapInPandas-shaped: the decoder sees
    // a batch iterator, not row-at-a-time calls)
    val decoded = media.select($"media_id", $"content", $"meta.mime".as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, mime) =>
          val (w, h, nf, ck) = fakeDecode(bytes)
          (id, mime, bytes.length.toLong, w, h, nf, ck, w / 2, h / 2)
        }
      }
      .toDF("media_id", "mime", "n_bytes", "width", "height",
        "n_frames", "checksum", "resized_w", "resized_h")
    decoded.orderBy($"media_id")
  }

  val m01Oracle: String =
    """SELECT doc_id AS media_id, 'image/fake' AS mime,
      |  length(text) AS n_bytes,
      |  (length(text) % 640) + 16 AS width,
      |  ((length(text) * 7) % 480) + 16 AS height,
      |  length(text) // 256 + 1 AS n_frames,
      |  list_sum(list_transform(split(text, ''), c -> ascii(c))) AS checksum,
      |  ((length(text) % 640) + 16) // 2 AS resized_w,
      |  (((length(text) * 7) % 480) + 16) // 2 AS resized_h
      |FROM documents ORDER BY media_id""".stripMargin

  /** m02: frame sampling — one output row per sampled frame (every 4th),
    * the explode-shaped half of a video pipeline. */
  def m02_frame_sample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"), encode($"text", "UTF-8").as("content"))
    val frames = media.as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val (_, _, nFrames, _) = fakeDecode(bytes)
        (0 until nFrames by 4).map { f =>
          // STUB frame feature: first byte of the frame's 256-byte span
          val firstByte =
            if (f * 256 < bytes.length) (bytes(f * 256) & 0xff).toLong else -1L
          (id, f.toLong, firstByte)
        }
      }
      .toDF("media_id", "frame_idx", "first_byte")
    frames.groupBy($"media_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum($"first_byte").as("first_byte_sum"))
      .orderBy($"media_id")
  }

  val m02Oracle: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, length(text) AS n,
      |    UNNEST(range(0, length(text) // 256 + 1, 4)) AS frame_idx
      |  FROM documents)
      |SELECT media_id, COUNT(*) AS n_sampled,
      |  SUM(CASE WHEN frame_idx * 256 < n
      |      THEN ascii(text[frame_idx * 256 + 1]) ELSE -1 END) AS first_byte_sum
      |FROM f JOIN documents ON doc_id = media_id
      |GROUP BY media_id ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_decode" -> (m01_media_decode _),
    "m02_frame_sample" -> (m02_frame_sample _),
  )

  val oracle: Map[String, String] = Map(
    "m01_media_decode" -> m01Oracle,
    "m02_frame_sample" -> m02Oracle,
  )
}
