package graft.warc

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives the splittable WARC DataSourceV2 with byte-range splits far
  * smaller than the file, asserting exactly-once record recovery against
  * the trusted single-pass splitter. */
class WarcSourceV2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("warc-v2-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def makeWarc(n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(WarcSource.toWireFormat("warcinfo", "", 0,
      "software: graft\n".getBytes(StandardCharsets.UTF_8)))
    (0 until n).foreach { i =>
      // bodies of varying size incl. gzip (binary) content, and every 7th
      // record EMBEDS a plausible fake WARC record (WARC-Type +
      // Content-Length + spec terminator) whose bogus 100 KB length would
      // jump many real records if a mid-split sync ever trusted it
      val body =
        if (i % 7 == 0)
          ("quoting a warc capture:\nWARC/1.0\r\nWARC-Type: response\r\n" +
            "WARC-Target-URI: https://fake/\r\nContent-Length: 100000\r\n\r\n" +
            "trailing junk " + i + " " + ("z" * (i % 300)))
            .getBytes(StandardCharsets.UTF_8)
        else if (i % 3 == 0) WarcSource.gzip(("doc " + i + " " + ("x" * (i % 500))).getBytes)
        else ("plain body " + i + " " + ("y" * (i % 700))).getBytes(StandardCharsets.UTF_8)
      out.write(WarcSource.toWireFormat("response", s"https://ex.gov.au/p/$i",
        body.length, body))
    }
    out.toByteArray
  }

  test("splittable source returns every record exactly once across splits") {
    val dir = Files.createTempDirectory("warcv2")
    val bytes = makeWarc(200)
    Files.write(dir.resolve("a.warc"), bytes)
    Files.write(dir.resolve("b.warc"), makeWarc(57))

    val expected =
      (WarcSource.splitWarc(bytes, "a.warc").toSeq ++
        WarcSource.splitWarc(makeWarc(57), "b.warc").toSeq)
        .filter(_.version != "0")
        .map(r => (r.header.getOrElse("warc-target-uri", ""), r.content.length, r.source))
        .sorted

    // 4 KiB ranges => many splits per file, most starting mid-record
    val df = spark.read.format("warc")
      .option("maxPartitionBytes", "4096")
      .load(dir.toString)
    assert(df.rdd.getNumPartitions > 10)

    val sp = spark
    import sp.implicits._
    val got = df.filter($"version" =!= "0")
      .select($"header".getItem("warc-target-uri"), $"content", $"source")
      .as[(String, Array[Byte], String)]
      .collect()
      .map { case (uri, c, src) => (Option(uri).getOrElse(""), c.length, src) }
      .toSeq.sorted
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("malformed numeric headers never fail the job under ANSI mode") {
    // crawl-controlled header values: "N/A" length, non-numeric load time
    val body = WarcSource.gzip(
      ("HTTP/1.1 200 OK\r\nX-Funnelback-Total-Request-Time-MS: fast\r\n" +
        "\n\r\n<html><body>hello ansi</body></html>")
        .getBytes(StandardCharsets.UTF_8))
    val rec = WarcSource.toWireFormat("response", "https://ex.gov.au/x", 123, body)
    val s = new String(rec, StandardCharsets.ISO_8859_1)
      .replace("Uncompressed-Content-Length: 123",
        "Uncompressed-Content-Length: N/A") // same byte length
    val dir = Files.createTempDirectory("warcansi")
    Files.write(dir.resolve("m.warc"), s.getBytes(StandardCharsets.ISO_8859_1))
    val recs = spark.read.format("warc").load(dir.toString)
      .as(org.apache.spark.sql.Encoders.product[WarcRecord])
    val rows = Pipeline.urlResources(recs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("size_bytes") == 0)     // unwrap_or(0) parity
    assert(r.getAs[Float]("load_time") == 0f)
  }

  /** Per-record gzip (Common Crawl layout): each record its own member. */
  private def makeWarcGz(n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(WarcSource.gzip(WarcSource.toWireFormat("warcinfo", "", 0,
      "software: graft\n".getBytes(StandardCharsets.UTF_8))))
    (0 until n).foreach { i =>
      // every 5th body is INCOMPRESSIBLE pseudo-random bytes salted with
      // literal gzip magics (1f 8b 08): deflate stores such data in raw
      // stored blocks, so the compressed stream itself contains magic
      // sequences a mid-split sync will land on — the trial-inflate
      // validation must reject them or records get double-emitted
      val body =
        if (i % 5 == 0) {
          val rnd = new scala.util.Random(i)
          val b = new Array[Byte](800 + i % 400)
          rnd.nextBytes(b)
          var j = 13
          while (j + 3 < b.length) {
            b(j) = 0x1f.toByte; b(j + 1) = 0x8b.toByte; b(j + 2) = 0x08.toByte
            j += 97
          }
          b
        } else ("gz body " + i + " " + ("w" * (i % 600)))
          .getBytes(StandardCharsets.UTF_8)
      out.write(WarcSource.gzip(WarcSource.toWireFormat("response",
        s"https://ex.gov.au/gz/$i", body.length, body)))
    }
    out.toByteArray
  }

  test("per-record .warc.gz splits on member boundaries, exactly once") {
    val dir = Files.createTempDirectory("warcv2gz")
    val bytes = makeWarcGz(200)
    Files.write(dir.resolve("a.warc.gz"), bytes)
    Files.write(dir.resolve("b.warc.gz"), makeWarcGz(57))

    // GZIPInputStream reads concatenated members, so the trusted
    // whole-archive decode is just gunzip + the single-pass splitter
    def expectOne(b: Array[Byte], src: String) =
      WarcSource.splitWarc(WarcSource.gunzip(b).get, src).toSeq
    val expected = (expectOne(bytes, "a.warc.gz") ++
        expectOne(makeWarcGz(57), "b.warc.gz"))
      .filter(_.version != "0")
      .map(r => (r.header.getOrElse("warc-target-uri", ""), r.content.length, r.source))
      .sorted

    // 2 KiB ranges: most splits start mid-member, many inside the salted
    // stored blocks full of fake gzip magics
    val df = spark.read.format("warc")
      .option("maxPartitionBytes", "2048")
      .load(dir.toString)
    assert(df.rdd.getNumPartitions > 20)

    val sp = spark
    import sp.implicits._
    val got = df.filter($"version" =!= "0")
      .select($"header".getItem("warc-target-uri"), $"content", $"source")
      .as[(String, Array[Byte], String)]
      .collect()
      .map { case (uri, c, src) => (Option(uri).getOrElse(""), c.length, src) }
      .toSeq.sorted
    assert(got.size == expected.size)
    assert(got == expected)
    // sanity: nothing degraded to sentinels either
    assert(df.filter($"version" === "0").count() == 0)
  }

  test(".warc.gz corrupt member yields one sentinel, neighbors survive") {
    val out = new java.io.ByteArrayOutputStream()
    (0 until 30).foreach { i =>
      val m = WarcSource.gzip(WarcSource.toWireFormat("response",
        s"https://ex.gov.au/c/$i", 10, ("body " + i + " pad").getBytes))
      if (i == 13) { // corrupt the deflate payload, keep header magic intact
        m(m.length / 2) = (m(m.length / 2) ^ 0x55).toByte
        m(m.length / 2 + 1) = (m(m.length / 2 + 1) ^ 0x2a).toByte
      }
      out.write(m)
    }
    val dir = Files.createTempDirectory("warcv2gzc")
    Files.write(dir.resolve("c.warc.gz"), out.toByteArray)
    val sp = spark
    import sp.implicits._
    val df = spark.read.format("warc")
      .option("maxPartitionBytes", "1024").load(dir.toString)
    val real = df.filter($"version" =!= "0")
      .select($"header".getItem("warc-target-uri")).as[String].collect().toSet
    // 29 of 30 records survive; the corrupted one is absent
    assert(real == (0 until 30).filter(_ != 13)
      .map(i => s"https://ex.gov.au/c/$i").toSet)
    // containment surfaced it (at least one sentinel), no task failure
    assert(df.filter($"version" === "0").count() >= 1)
  }

  test("single-stream .warc.gz degrades to one owning split, still exact") {
    // one gzip member wrapping the WHOLE archive: not a per-record
    // layout; the split owning byte 0 decodes everything, others own no
    // member start
    val dir = Files.createTempDirectory("warcv2gzs")
    Files.write(dir.resolve("s.warc.gz"), WarcSource.gzip(makeWarc(40)))
    val sp = spark
    import sp.implicits._
    val real = spark.read.format("warc")
      .option("maxPartitionBytes", "2048").load(dir.toString)
      .filter($"version" =!= "0").count()
    assert(real == 41L) // 40 + warcinfo
  }

  test("single-split read matches whole-file read") {
    val dir = Files.createTempDirectory("warcv2b")
    Files.write(dir.resolve("one.warc"), makeWarc(20))
    val whole = spark.read.format("warc").load(dir.toString).count()
    val split = spark.read.format("warc")
      .option("maxPartitionBytes", "512").load(dir.toString).count()
    // same non-sentinel record count regardless of split granularity
    val sp = spark
    import sp.implicits._
    val wholeReal = spark.read.format("warc").load(dir.toString)
      .filter($"version" =!= "0").count()
    val splitReal = spark.read.format("warc")
      .option("maxPartitionBytes", "512").load(dir.toString)
      .filter($"version" =!= "0").count()
    assert(wholeReal == 21 && splitReal == 21)
    assert(whole >= 21 && split >= 21) // sentinels may add rows, never remove
  }
}
