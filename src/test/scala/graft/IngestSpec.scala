package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.Ingest

/** RAW-landing ingest: schema-on-read with corrupt-record quarantine. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("value", DoubleType)))

  test("jsonl ingest splits clean and corrupt rows from one read") {
    val dir = Files.createTempDirectory("jsonl")
    Files.writeString(dir.resolve("feed.jsonl"),
      """{"id": 1, "name": "a", "value": 1.5}
        |{"id": 2, "name": "b", "value": 2.5}
        |{not json at all
        |{"id": "also-broken-type?", "name": 3}
        |{"id": 4, "name": "d", "value": 4.0}
        |""".stripMargin)
    val batch = Ingest.readJsonl(spark, dir.toString, schema)
    assert(batch.clean.count() == 3)
    assert(batch.clean.columns.toSeq == Seq("id", "name", "value"))
    val corruptRows = batch.corrupt.collect().map(_.getString(0))
    assert(corruptRows.length == 2)
    assert(corruptRows.exists(_.contains("not json")))
    batch.unpersist() // split is materialized; release the cached parse
  }

  test("csv ingest quarantines malformed lines") {
    val dir = Files.createTempDirectory("csv")
    Files.writeString(dir.resolve("feed.csv"),
      """id,name,value
        |1,a,1.5
        |2,b,not-a-number
        |3,c,3.5
        |""".stripMargin)
    val batch = Ingest.readCsv(spark, dir.toString, schema)
    assert(batch.clean.count() == 2)
    assert(batch.corrupt.count() == 1)
    assert(batch.corrupt.head().getString(0).contains("not-a-number"))
    batch.unpersist()
  }

  test("clean feed produces an empty quarantine") {
    val dir = Files.createTempDirectory("jsonl2")
    Files.writeString(dir.resolve("ok.jsonl"),
      """{"id": 1, "name": "x", "value": 0.1}""" + "\n")
    val batch = Ingest.readJsonl(spark, dir.toString, schema)
    assert(batch.clean.count() == 1)
    assert(batch.corrupt.count() == 0)
    batch.unpersist()
  }
}
