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
