package graft.warc

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row}

/** K1 Avro container sink (SURVEY.md §2.1; reference writes Avro with a
  * buffered container writer, `src/main.rs:189-191,486-492`).
  *
  * The runtime has no spark-avro module (zero-egress build), so the sink
  * goes through avro-mapred's `AvroKeyOutputFormat` — real Avro container
  * files, one per partition, distributed write with no driver collect.
  * Buffering/flushing (reference D6) is the container writer's concern.
  *
  * The schema literal mirrors the reference's (`src/main.rs:69-99`):
  * 18 non-null fields; `load_time`/keyword scores stay 32-bit floats.
  */
object AvroSink {

  val schemaJson: String = {
    def f(name: String, t: String) = s"""{"name":"$name","type":$t}"""
    val str = "\"string\""
    val arr = """{"type":"array","items":"string"}"""
    val mapStr = """{"type":"map","values":"string"}"""
    val mapFloat = """{"type":"map","values":"float"}"""
    s"""{"type":"record","name":"url_resource","fields":[
       ${f("url", str)},${f("hostname", str)},${f("domain_name", str)},
       ${f("size_bytes", "\"int\"")},${f("load_time", "\"float\"")},
       ${f("title", str)},${f("text_content", str)},${f("headings_text", str)},
       ${f("word_count", "\"int\"")},${f("links", arr)},${f("resource_urls", arr)},
       ${f("keywords", mapFloat)},${f("meta_tags", mapStr)},${f("headers", mapStr)},
       ${f("google_analytics", arr)},${f("google_analytics_config", arr)},
       ${f("html_errors", str)},${f("source", str)}]}"""
  }

  def schema: Schema = new Schema.Parser().parse(schemaJson)

  private def toGenericRecord(row: Row, s: Schema): GenericRecord = {
    val rec = new GenericData.Record(s)
    s.getFields.asScala.foreach { field =>
      val v = row.getAs[Any](field.name) match {
        case seq: scala.collection.Seq[_] => seq.asJava
        case m: scala.collection.Map[_, _] => m.asJava
        case other => other
      }
      rec.put(field.name, v)
    }
    rec
  }

  /** Distributed write of a url_resource DataFrame as Avro containers. */
  def write(df: DataFrame, path: String): Unit = {
    val json = schemaJson
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    df.rdd.mapPartitions { rows =>
      val s = new Schema.Parser().parse(json)
      rows.map(r => (new AvroKey[GenericRecord](toGenericRecord(r, s)),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}
