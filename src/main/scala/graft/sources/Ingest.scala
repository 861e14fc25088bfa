package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** RAW-zone landing readers (lakehouse ingest surface): schema-on-read
  * for semi-structured feeds with malformed rows captured instead of
  * failing the load — the distributed analog of the reference's
  * quarantine-on-ingest posture. PERMISSIVE parsing keeps the pipeline
  * running on a 100 TB feed where some fraction of records is always
  * broken; the corrupt split lands in quarantine for the quality loop.
  */
/** One parsed ingest feed: the clean/corrupt split plus the cached parse
  * backing both. Call [[unpersist]] after materializing (writing) both
  * sides — the cache is required so the split comes from ONE read, but
  * holding it for the session lifetime would accumulate blocks across
  * repeated ingests. */
final case class IngestBatch(clean: DataFrame, corrupt: DataFrame,
    private val raw: DataFrame) {
  def unpersist(): Unit = { raw.unpersist(); () }
}

object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType))

  private def split(raw: DataFrame): IngestBatch = {
    // Spark defers corrupt-record capture; materialize the split off a
    // cached parse so clean/corrupt come from ONE read
    val cached = raw.cache()
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val corrupt = cached.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record"))
    IngestBatch(clean, corrupt, cached)
  }

  /** JSON-lines with an enforced schema → clean/corrupt split.
    * Corrupt rows keep their raw line in `_corrupt_record`. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : IngestBatch =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  /** CSV with header + enforced schema → clean/corrupt split. */
  def readCsv(spark: SparkSession, path: String, schema: StructType)
      : IngestBatch =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path))
}
