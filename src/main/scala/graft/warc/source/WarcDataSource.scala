package graft.warc.source

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Splittable WARC DataSourceV2 — the 100 TB path for S1 (SURVEY.md §2.1,
  * §7 "known-hard" item: `binaryFile` materializes a whole file per task,
  * fine for ≤1 GB WARCs but wrong for huge containers).
  *
  * Each file is carved into byte-range `InputPartition`s of
  * `maxPartitionBytes` (default 128 MiB, same knob semantics as Spark's
  * file sources). A reader that doesn't start at offset 0 scans forward
  * to the next `WARC/` record-boundary magic (Hadoop text-split
  * ownership rule: a record belongs to the split containing its first
  * byte; a reader keeps consuming past its end until the record that
  * STARTS beyond the range). Records are streamed — peak memory is one
  * record, not one file.
  *
  * Registered as `spark.read.format("warc").load(dir)` via
  * DataSourceRegister. Plain `.warc` containers split on WARC/ magic
  * ([[WarcPartitionReader]]); per-record-gzipped `.warc.gz` archives
  * (each record its own gzip member — the Common Crawl layout) split on
  * validated gzip-member boundaries ([[GzipWarcPartitionReader]]). Only
  * a SINGLE-stream `.warc.gz` (one gzip member for the whole archive,
  * rare and hostile to any splitter) degrades: the split owning byte 0
  * decodes the whole file and the others find no member to own.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("header", MapType(StringType, StringType), nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("source", StringType, nullable = false)))
}

class WarcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"warc(${options.get("path")})"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(opts)
}

class WarcScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = new WarcScan(options)
}

final case class WarcInputPartition(file: String, start: Long, length: Long)
  extends InputPartition

class WarcScan(options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = WarcDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("warc source requires a path"))
    val maxBytes = Option(options.get("maxPartitionBytes"))
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val hadoopConf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val glob = Option(options.get("pathGlobFilter"))
      .map(g => new org.apache.hadoop.fs.GlobFilter(g))
    val hasWildcard = path.exists("*?[{".contains(_))
    val listed =
      if (hasWildcard) Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      else if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    val files = listed
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st))
      .filter(st => st.isFile && glob.forall(_.accept(st.getPath)))
    files.flatMap { st =>
      val len = st.getLen
      val nSplits = math.max(1, ((len + maxBytes - 1) / maxBytes).toInt)
      (0 until nSplits).map { i =>
        val start = i.toLong * maxBytes
        WarcInputPartition(st.getPath.toString, start,
          math.min(maxBytes, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

/** Hadoop Configuration is not Serializable; executors need the driver's
  * FS settings (credentials, endpoints) — standard write/readFields
  * round-trip. */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class WarcReaderFactory(conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    // per-record-gzipped archives (the Common Crawl layout) split on
    // gzip-member boundaries; plain containers on WARC/ magic
    if (p.file.endsWith(".gz")) new GzipWarcPartitionReader(p, conf.value)
    else new WarcPartitionReader(p, conf.value)
  }
}
