package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, batch decode / feature
  * extraction / resize / frame sampling.
  *
  * The codec is REAL: images are genuine PNG files produced by
  * `javax.imageio` (zero extra deps) and decoded back with `ImageIO.read`
  * — lossless 8-bit grayscale, so raster samples round-trip exactly.
  * The pixel CONTENT is a deterministic function of `doc_id`
  * (`pixel(x,y) = (doc_id%256 + x + y) % 256`), which is what lets a SQL
  * oracle recompute every decoded feature from the base table without
  * itself having a PNG decoder. Everything around the codec — binary
  * column handling, metadata struct schema, batched per-partition
  * processing (the JVM twin of `mapInPandas` batch shape), container
  * parse + explode of sampled frames — is real Spark plumbing.
  */
object MultimodalOps {

  // ImageIO wraps every read/write stream in a FileCacheImageInput/
  // OutputStream by default — one temp-file create+delete in java.io.tmpdir
  // PER codec call. At ~33k frame encodes+decodes per m02 run that is
  // pure filesystem churn (measured: m02 swung 2.2–15 s run-to-run at
  // sf0.1 from /tmp contention alone). All media here are in-memory
  // byte arrays; cache in heap. Object init runs once per executor JVM
  // (first helper call), so the setting lands wherever the codec runs.
  // NOTE: this is a JVM-GLOBAL ImageIO mutation — acceptable here
  // because every media column in this engine is an in-memory byte
  // array; if another ImageIO consumer streaming genuinely large media
  // ever shares the JVM, scope the behavior per-stream with
  // MemoryCacheImageInputStream wrappers instead.
  ImageIO.setUseCache(false)

  /** Deterministic synthetic image parameters for a document. */
  def imageDims(docId: Long): (Int, Int, Int) = {
    val w = (docId % 48).toInt + 16
    val h = ((docId * 7) % 48).toInt + 16
    val base = (docId % 256).toInt
    (w, h, base)
  }

  /** Encode a real PNG: 8-bit grayscale, pixel(x,y) = (base+x+y) % 256. */
  def encodePng(docId: Long): Array[Byte] = {
    val (w, h, base) = imageDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, (base + x + y) % 256); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image features: dims, full-resolution pixel sum, and the
    * pixel sum after a real 2× nearest-neighbour downscale. */
  def decodeFeatures(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var pixelSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { pixelSum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    val rw = w / 2
    val rh = h / 2
    var resizedSum = 0L
    y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) { resizedSum += raster.getSample(2 * x, 2 * y, 0); x += 1 }
      y += 1
    }
    (w, h, pixelSum, resizedSum)
  }

  /** m01: binary ingestion + batched decode + resize. The binary column
    * holds real PNG bytes synthesized per `doc_id`; decode runs
    * `ImageIO.read` per record inside `mapPartitions`. */
  def m01_media_decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"), $"source")
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, source) => (id, encodePng(id), "image/png", source) }
      }
      .toDF("media_id", "content", "mime", "origin")
      .select($"media_id", $"content",
        struct($"mime", $"origin").as("meta"))
    // batched per-partition decode (mapInPandas-shaped: the decoder sees
    // a batch iterator, not row-at-a-time driver calls)
    val decoded = media.select($"media_id", $"content", $"meta.mime".as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, mime) =>
          val (w, h, pixelSum, resizedSum) = decodeFeatures(bytes)
          (id, mime, w.toLong, h.toLong, (w / 2).toLong, (h / 2).toLong,
            pixelSum, resizedSum)
        }
      }
      .toDF("media_id", "mime", "width", "height", "resized_w", "resized_h",
        "pixel_sum", "resized_pixel_sum")
    decoded.orderBy($"media_id")
  }

  /** Oracle recomputes the decoded features arithmetically: the image is
    * (doc_id%48+16) × (doc_id*7%48+16) with pixel (doc_id%256+x+y)%256;
    * nearest-neighbour 2× downscale picks pixel (2x, 2y). */
  val m01Oracle: String =
    """WITH dims AS (
      |  SELECT doc_id, (doc_id % 48) + 16 AS w, ((doc_id * 7) % 48) + 16 AS h,
      |    doc_id % 256 AS base
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    CAST(SUM((base + x.x + y.y) % 256) AS BIGINT) AS pixel_sum
      |  FROM dims, UNNEST(range(0, w)) AS x(x), UNNEST(range(0, h)) AS y(y)
      |  GROUP BY 1, 2, 3),
      |rpx AS (
      |  SELECT doc_id,
      |    CAST(COALESCE(SUM((base + 2 * x.x + 2 * y.y) % 256), 0) AS BIGINT)
      |      AS resized_pixel_sum
      |  FROM dims, UNNEST(range(0, w // 2)) AS x(x), UNNEST(range(0, h // 2)) AS y(y)
      |  GROUP BY 1)
      |SELECT px.doc_id AS media_id, 'image/png' AS mime,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(w // 2 AS BIGINT) AS resized_w, CAST(h // 2 AS BIGINT) AS resized_h,
      |  pixel_sum, resized_pixel_sum
      |FROM px JOIN rpx ON px.doc_id = rpx.doc_id
      |ORDER BY media_id""".stripMargin

  /** Frame-container codec: a length-prefixed concatenation of real PNGs
    * (`GVID` magic, frame count, then [len][png bytes] per frame) — the
    * parse-a-container half of a video pipeline, with each frame a
    * constant-gray 8×8 PNG of value (doc_id%256 + f) % 256. */
  def encodeVideo(docId: Long): Array[Byte] = {
    val nFrames = (docId % 12).toInt + 1
    val base = (docId % 256).toInt
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(0x47564944) // "GVID"
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { raster.setSample(x, y, 0, (base + f) % 256); x += 1 }
        y += 1
      }
      val frameBytes = new ByteArrayOutputStream()
      ImageIO.write(img, "png", frameBytes)
      val b = frameBytes.toByteArray
      out.writeInt(b.length)
      out.write(b)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Parse the container, decode every 4th frame with ImageIO, return
    * (frame_idx, mean pixel value) per sampled frame. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == 0x47564944, "bad container magic")
    val nFrames = in.readInt()
    (0 until nFrames).flatMap { f =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      if (f % stride != 0) None
      else {
        val img = ImageIO.read(new ByteArrayInputStream(b))
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Some((f, sum / (img.getWidth.toLong * img.getHeight)))
      }
    }
  }

  /** m02: frame sampling — one row per sampled frame (every 4th), the
    * explode-shaped half of a video pipeline, then per-media rollup. */
  def m02_frame_sample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"))
      .as[Long]
      .mapPartitions { batch => batch.map(id => (id, encodeVideo(id))) }
      .toDF("media_id", "content")
    val frames = media.as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        sampleFrames(bytes, 4).map { case (f, mean) => (id, f.toLong, mean) }
      }
      .toDF("media_id", "frame_idx", "mean_pixel")
    frames.groupBy($"media_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum($"mean_pixel").as("mean_pixel_sum"))
      .orderBy($"media_id")
  }

  val m02Oracle: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id,
      |    UNNEST(range(0, (doc_id % 12) + 1, 4)) AS frame_idx
      |  FROM documents)
      |SELECT media_id, COUNT(*) AS n_sampled,
      |  CAST(SUM((media_id % 256 + frame_idx) % 256) AS BIGINT) AS mean_pixel_sum
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- m03 audio ----

  /** Deterministic synthetic waveform for a document: (doc_id%500)+100
    * PCM16 samples at 8 kHz, sample(i) = ((doc_id·31 + i²) % 2001) − 1000
    * — integer-exact so the oracle can recompute every feature. */
  def audioParams(docId: Long): (Int, Int) = (((docId % 500) + 100).toInt, 8000)

  def sampleAt(docId: Long, i: Int): Int =
    (((docId * 31 + i.toLong * i) % 2001) - 1000).toInt

  /** Encode a REAL RIFF/WAVE file from arbitrary samples: 44-byte
    * canonical header (PCM, mono, 16-bit little-endian) + the raw
    * sample data. */
  def encodeWavSamples(samples: Array[Int], rate: Int): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val bos = new ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >>> 24) & 0xff) }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); le32(36 + dataLen); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(1); le32(rate)
    le32(rate * 2); le16(2); le16(16)
    tag("data"); le32(dataLen)
    var i = 0
    while (i < n) { le16(samples(i) & 0xffff); i += 1 }
    bos.toByteArray
  }

  /** The synthetic waveform of a document as a WAV container. */
  def encodeWav(docId: Long): Array[Byte] = {
    val (n, rate) = audioParams(docId)
    encodeWavSamples(Array.tabulate(n)(sampleAt(docId, _)), rate)
  }

  /** Parse the WAV container back (magic + fmt validation, little-endian
    * field reads) and extract waveform features: sample count, duration,
    * absolute-amplitude sum (integer energy), zero-crossing count
    * (sign flip between consecutive samples; 0 counts as non-negative). */
  def audioFeatures(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Int = u16(o) | (u16(o + 2) << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE" && tag(12) == "fmt " &&
      tag(36) == "data", "bad WAV container")
    require(u16(20) == 1 && u16(34) == 16, "not 16-bit PCM")
    val rate = u32(24)
    val n = u32(40) / 2
    var sumAbs = 0L
    var zc = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val raw = u16(44 + 2 * i)
      val s = if (raw >= 0x8000) raw - 0x10000 else raw // sign-extend
      sumAbs += math.abs(s)
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    (n.toLong, n.toLong * 1000 / rate, sumAbs, zc, rate.toLong)
  }

  /** m03: audio decode + feature extraction — the third modality next to
    * m01 (image) and m02 (video). Real WAV bytes in the binary column,
    * batched per-partition decode, integer features the oracle recomputes
    * from the waveform formula without a WAV parser. */
  def m03_audio_features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"))
      .as[Long]
      .mapPartitions { batch => batch.map(id => (id, encodeWav(id))) }
      .toDF("media_id", "content")
    media.as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val (n, ms, sumAbs, zc, rate) = audioFeatures(bytes)
          (id, n, ms, sumAbs, zc, rate)
        }
      }
      .toDF("media_id", "n_samples", "duration_ms", "abs_sum",
        "zero_crossings", "sample_rate")
      .orderBy($"media_id")
  }

  val m03Oracle: String =
    """WITH p AS (
      |  SELECT doc_id AS media_id, (doc_id % 500) + 100 AS n FROM documents),
      |s AS (
      |  SELECT media_id, n, i.i AS i,
      |    ((media_id * 31 + i.i * i.i) % 2001) - 1000 AS v,
      |    ((media_id * 31 + (i.i - 1) * (i.i - 1)) % 2001) - 1000 AS pv
      |  FROM p, UNNEST(range(0, n)) AS i(i))
      |SELECT media_id,
      |  CAST(MAX(n) AS BIGINT) AS n_samples,
      |  CAST(MAX(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
      |  CAST(SUM(CASE WHEN i > 0 AND ((pv < 0) <> (v < 0))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      |  CAST(8000 AS BIGINT) AS sample_rate
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** 8×8 average-hash (aHash) of a decoded image: 64 nearest-neighbour
    * samples, integer mean, bit(y·8+x) = sample > mean — the standard
    * perceptual near-dup fingerprint, computed from the REAL decoded
    * raster. */
  def aHash(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](64)
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { px(i) = raster.getSample(x * w / 8, y * h / 8, 0); i += 1; x += 1 }
      y += 1
    }
    var sum = 0
    i = 0
    while (i < 64) { sum += px(i); i += 1 }
    val mean = sum / 64
    var out = 0L
    i = 0
    while (i < 64) { if (px(i) > mean) out |= (1L << i); i += 1 }
    out
  }

  /** m04: image near-dup via perceptual hash — the multimodal twin of
    * d03: decode every image (real PNG codec), compute its aHash, band
    * the 64 bits 4×16 (pigeonhole: any pair within hamming ≤ 3 shares a
    * band — so at threshold 3 the banding is COMPLETE and the pair set
    * exactly matches the oracle's all-pairs recompute), bucket-join,
    * verify `bit_count(xor) ≤ 3` in codegen, and report each image's
    * near-dup partner count.
    *
    * Gradient images make aHash groups genuinely degenerate (THOUSANDS
    * of identical hashes at sf0.1 — realistic for near-dup imagery), so
    * pairing runs over identical-hash EQUIVALENCE CLASSES, not raw docs:
    * distinct hashes band/bucket/pair (one row per class, keyed by the
    * class's min doc_id for the guard), the hamming verify runs on class
    * pairs, and per-doc counts EXPAND arithmetically afterwards —
    * within-class partners = |class| − 1 (hamming 0), cross-class
    * partners = Σ |matched class|. The r4 shape banded raw doc ids and
    * hit the star-link cap at sf0.1 (largest bucket 2034 > cap 1000),
    * silently-by-contract undercounting vs the all-pairs oracle; in
    * class space that same flood is a handful of rows, the pair set is
    * EXACT again at every gate sf, and the identical-image flood costs
    * O(distinct hashes) instead of O(docs) forever after. The
    * star-link guard still backstops a flood of DISTINCT hashes in one
    * band bucket (exact-pair consumers keep distinct-hash buckets under
    * cap — all gate SFs are far under). */
  def m04_image_neardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashes = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id").as[Long]
      .mapPartitions { batch => batch.map(id => (id, aHash(encodePng(id)))) }
      .toDF("doc_id", "ahash")
    graft.dedup.DedupOps.withCache(hashes) { hs =>
      // identical-hash classes: one node per distinct ahash
      val classes = hs.groupBy($"ahash")
        .agg(count(lit(1)).as("cls_n"), min($"doc_id").as("cls_id"))
      graft.dedup.DedupOps.withCache(classes) { cls =>
        val banded = cls.select($"cls_id".as("doc_id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              ($"ahash".bitwiseAND(lit(0xffffL << (b * 16)))).as("bits"))): _*))
            .as("bb"))
          .select($"doc_id", $"bb.band", $"bb.bits")
        val cand = graft.dedup.DedupOps.guardedBucketPairs(banded, Seq("band", "bits"))
        val clsPairs = cand
          .join(cls.select($"cls_id".as("id_a"), $"ahash".as("ha"),
            $"cls_n".as("na")), "id_a")
          .join(cls.select($"cls_id".as("id_b"), $"ahash".as("hb"),
            $"cls_n".as("nb")), "id_b")
          .filter(bit_count($"ha".bitwiseXOR($"hb")) <= 3)
        // each member of class A gains |B| partners and vice versa
        val crossPerClass = clsPairs.select($"ha".as("ahash"), $"nb".as("add"))
          .unionByName(clsPairs.select($"hb".as("ahash"), $"na".as("add")))
          .groupBy($"ahash").agg(sum($"add").as("cross_n"))
        hs.join(cls.select($"ahash", $"cls_n"), "ahash")
          .join(crossPerClass, Seq("ahash"), "left")
          .select($"doc_id".as("media_id"), $"ahash",
            ($"cls_n" - 1 + coalesce($"cross_n", lit(0L))).as("n_neardups"))
          .orderBy($"media_id")
      }
    }
  }

  val m04Oracle: String =
    """WITH dims AS (
      |  SELECT doc_id, (doc_id % 48) + 16 AS w, ((doc_id * 7) % 48) + 16 AS h,
      |         doc_id % 256 AS base
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, (y * 8 + x) AS bit,
      |    (base + ((x * w) // 8) + ((y * h) // 8)) % 256 AS v
      |  FROM dims, UNNEST(range(8)) AS ux(x), UNNEST(range(8)) AS uy(y)),
      |m AS (SELECT doc_id, CAST(SUM(v) // 64 AS BIGINT) AS mean
      |      FROM px GROUP BY 1),
      |ah AS (
      |  SELECT p.doc_id, CAST(SUM(CASE
      |      WHEN v <= mean THEN 0
      |      WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |      ELSE CAST(CAST(1 AS BIGINT) << bit AS HUGEINT) END) AS BIGINT)
      |    AS ahash
      |  FROM px p JOIN m USING (doc_id) GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib
      |  FROM ah a JOIN ah b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
      |pc AS (
      |  SELECT doc_id, COUNT(*) AS n FROM (
      |    SELECT ia AS doc_id FROM pairs
      |    UNION ALL SELECT ib FROM pairs) t
      |  GROUP BY 1)
      |SELECT ah.doc_id AS media_id, ah.ahash, COALESCE(pc.n, 0) AS n_neardups
      |FROM ah LEFT JOIN pc ON pc.doc_id = ah.doc_id
      |ORDER BY 1""".stripMargin

  /** Decode EVERY frame of a container, returning (frame_idx, mean
    * pixel) — the stride-1 sibling of [[sampleFrames]], used by the
    * cross-video dedup where skipping frames would miss duplicates. */
  def allFrames(bytes: Array[Byte]): Seq[(Int, Long)] = sampleFrames(bytes, 1)

  /** m05: cross-video FRAME-level dedup — d11's line-dedup idea applied
    * to the video modality (repeated intro/outro/placeholder frames
    * shared across otherwise distinct videos are the boilerplate of
    * video corpora). Every container is parsed and EVERY frame decoded
    * with the real PNG codec (`ImageIO`, stride 1); the frame
    * fingerprint is its mean pixel value — for these synthetic
    * constant-raster frames the mean IS the content, which is exactly
    * what lets the SQL oracle recompute fingerprints arithmetically
    * from the base table while the Spark side derives them from decoded
    * bytes. A fingerprint seen in ≥ 2 distinct videos marks a shared
    * frame class.
    *
    * Scale shape: one explode (container → frames, map-side decode),
    * ONE shuffle on the fingerprint for the class aggregate, one
    * broadcast-join back for the instance rollup — linear, the digest
    * equivalence class bounds everything (no pairwise frame compare
    * exists in the plan). */
  def m05_frame_neardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frames = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"))
      .as[Long]
      .mapPartitions { batch =>
        batch.flatMap { id =>
          allFrames(encodeVideo(id)).map { case (f, mean) => (id, f.toLong, mean) }
        }
      }
      .toDF("media_id", "frame_idx", "fp")
    graft.dedup.DedupOps.withCache(frames) { fr =>
      val cls = fr.groupBy($"fp")
        .agg(count(lit(1)).as("cls_n"), countDistinct($"media_id").as("cls_videos"))
      fr.join(broadcast(cls), "fp")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct($"fp").as("n_distinct_fp"),
          countDistinct(when($"cls_videos" >= 2, $"fp")).as("n_shared_fp"),
          sum(when($"cls_videos" >= 2, 1L).otherwise(0L)).as("n_dup_instances"),
          countDistinct(when($"cls_videos" >= 2, $"media_id"))
            .as("n_videos_with_shared"),
          max($"cls_videos").as("max_videos_per_fp"))
    }
  }

  val m05Oracle: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id,
      |    UNNEST(range(0, (doc_id % 12) + 1)) AS frame_idx
      |  FROM documents),
      |fp AS (
      |  SELECT media_id, frame_idx,
      |    (media_id % 256 + frame_idx) % 256 AS fp
      |  FROM f),
      |cls AS (
      |  SELECT fp, COUNT(*) AS cls_n, COUNT(DISTINCT media_id) AS cls_videos
      |  FROM fp GROUP BY 1)
      |SELECT COUNT(*) AS n_frames,
      |  COUNT(DISTINCT p.fp) AS n_distinct_fp,
      |  COUNT(DISTINCT CASE WHEN cls_videos >= 2 THEN p.fp END) AS n_shared_fp,
      |  CAST(SUM(CASE WHEN cls_videos >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_instances,
      |  COUNT(DISTINCT CASE WHEN cls_videos >= 2 THEN media_id END)
      |    AS n_videos_with_shared,
      |  MAX(cls_videos) AS max_videos_per_fp
      |FROM fp p JOIN cls ON cls.fp = p.fp""".stripMargin

  /** 64-bit frame-energy fingerprint of a WAV payload — the audio twin
    * of [[aHash]]: samples split into 64 time frames (sample i → frame
    * i·64/n, every frame non-empty for n ≥ 64), bit j set when frame
    * j's absolute-amplitude sum exceeds the track mean (64·fs > total —
    * integer cross-multiplication, no division). Robust to small
    * amplitude edits (a ±1 sample shifts one frame sum and the total by
    * 1), discriminative across tracks (independent waveforms set ~half
    * the bits each, hamming ~32). */
  def audioFingerprint(bytes: Array[Byte]): Long = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Int = u16(o) | (u16(o + 2) << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE" && tag(12) == "fmt " &&
      tag(36) == "data", "bad WAV container")
    require(u16(20) == 1 && u16(34) == 16, "not 16-bit PCM")
    val n = u32(40) / 2
    val frameSum = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val raw = u16(44 + 2 * i)
      val s = if (raw >= 0x8000) raw - 0x10000 else raw
      val a = math.abs(s).toLong
      frameSum((i.toLong * 64 / n).toInt) += a
      total += a
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (frameSum(j) * 64 > total) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** m06: cross-track AUDIO near-duplicate detection — the audio member
    * of the near-dup family (d03 text SimHash, m04 image aHash): every
    * track's decoded waveform collapses to the 64-bit
    * [[audioFingerprint]], fingerprints bucket by 4×16-bit pigeonhole
    * bands (any pair within hamming ≤ 3 shares a band — d03's
    * guarantee), and band-matched candidates verify at hamming ≤ 3 in
    * codegen (`bit_count(xor)`). Planted near-identical copies
    * (media_id + 100000, sample 1 amplitude +1 — a real waveform edit
    * re-encoded through the real WAV codec) give ground truth: all 500
    * land within hamming 3 and are found.
    *
    * Scale shape: fingerprints are map-side (batched per-partition
    * decode), banding explodes 4 rows per track, ONE shuffle on
    * (band, bits) with the oversized-bucket star guard, verify joins
    * are candidate-sized — no pairwise product over tracks. Fully
    * SQL-expressible (the waveform is a deterministic integer function
    * of doc_id, the m03 device) → oracle-checked. */
  def m06_audio_neardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Shift = 100000L
    val fps = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id".as("media_id"))
      .as[Long]
      .mapPartitions { batch =>
        batch.flatMap { id =>
          val (n, rate) = audioParams(id)
          val base = Array.tabulate(n)(sampleAt(id, _))
          val perturbed = base.clone()
          if (n > 1) perturbed(1) += 1
          Iterator(
            (id, audioFingerprint(encodeWavSamples(base, rate))),
            (id + Shift, audioFingerprint(encodeWavSamples(perturbed, rate))))
        }
      }
      .toDF("media_id", "sig")
    graft.dedup.DedupOps.withCache(fps) { sigs =>
      val banded = sigs.select($"media_id",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            ($"sig".bitwiseAND(lit(0xffffL << (b * 16)))).as("bits"))): _*))
          .as("bb"))
        .select($"media_id".as("doc_id"), $"bb.band", $"bb.bits")
      val cand = graft.dedup.DedupOps.guardedBucketPairs(banded, Seq("band", "bits"))
      cand
        .join(sigs.select($"media_id".as("id_a"), $"sig".as("sig_a")), "id_a")
        .join(sigs.select($"media_id".as("id_b"), $"sig".as("sig_b")), "id_b")
        .filter(bit_count($"sig_a".bitwiseXOR($"sig_b")) <= 3)
        .agg(count(lit(1)).as("n_confirmed"),
          sum(when($"id_b" === $"id_a" + Shift, 1L).otherwise(0L))
            .as("n_planted_found"))
    }
  }

  val m06Oracle: String =
    """WITH p AS (
      |  SELECT doc_id AS media_id, doc_id AS src, (doc_id % 500) + 100 AS n,
      |    0 AS pert
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id, (doc_id % 500) + 100, 1 FROM documents),
      |s AS (
      |  SELECT media_id, n, i.i AS i,
      |    ((src * 31 + i.i * i.i) % 2001) - 1000
      |      + CASE WHEN pert = 1 AND i.i = 1 THEN 1 ELSE 0 END AS v
      |  FROM p, UNNEST(range(0, n)) AS i(i)),
      |fr AS (
      |  SELECT media_id, (i * 64) // n AS f, SUM(ABS(v)) AS fs
      |  FROM s GROUP BY 1, 2),
      |tot AS (SELECT media_id, SUM(fs) AS tot FROM fr GROUP BY 1),
      |sig AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN fs * 64 > tot THEN CAST(1 AS HUGEINT) << f
      |             ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS sig
      |  FROM fr JOIN tot USING (media_id) GROUP BY 1),
      |banded AS (
      |  SELECT media_id, b, sig & (CAST(65535 AS UBIGINT) << (b * 16)) AS bits
      |  FROM sig, UNNEST(range(0, 4)) AS rb(b)),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.bits = b.bits AND a.media_id < b.media_id),
      |confirmed AS (
      |  SELECT id_a, id_b FROM pairs
      |    JOIN sig sa ON sa.media_id = id_a
      |    JOIN sig sb ON sb.media_id = id_b
      |  WHERE bit_count(xor(sa.sig, sb.sig)) <= 3)
      |SELECT COUNT(*) AS n_confirmed,
      |  CAST(SUM(CASE WHEN id_b = id_a + 100000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_planted_found
      |FROM confirmed""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m04_image_neardup" -> (m04_image_neardup _),
    "m01_media_decode" -> (m01_media_decode _),
    "m02_frame_sample" -> (m02_frame_sample _),
    "m03_audio_features" -> (m03_audio_features _),
    "m05_frame_neardup" -> (m05_frame_neardup _),
    "m06_audio_neardup" -> (m06_audio_neardup _),
  )

  val oracle: Map[String, String] = Map(
    "m04_image_neardup" -> m04Oracle,
    "m01_media_decode" -> m01Oracle,
    "m02_frame_sample" -> m02Oracle,
    "m03_audio_features" -> m03Oracle,
    "m05_frame_neardup" -> m05Oracle,
    "m06_audio_neardup" -> m06Oracle,
  )
}
