package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Transforms

/** Medallion-ETL queries (SURVEY.md §2.3) — the reference's load types
  * and standard transforms (/root/reference/src/etl/etl_manager.py)
  * re-expressed as oracle-checkable DataFrame pipelines on the testdata.
  */
object EtlQueries {

  /** #22 — bronze cleanse on `documents`: trim_strings + null_handling +
    * uppercase_codes(lang) + deduplicate(doc_id), one narrow pipeline
    * (no shuffle except the dedup window on doc_id). */
  def etlBronzeCleanse(s: SparkSession, dir: String): DataFrame = {
    val sentinels = Transforms.nullSentinels
    val cleaned = Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        trim(col("text")).as("text"),
        upper(trim(col("lang"))).as("lang"),
        when(trim(col("source")).isin(sentinels: _*), lit(null))
          .otherwise(trim(col("source"))).as("source"),
        col("n_chars"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("source").asc_nulls_first, col("text").asc)
    cleaned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .select(col("doc_id"), length(col("text")).as("text_len"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** #23 — LoadType.MERGE upsert: delta rows (every even orderkey, price
    * bumped 10%) win over base rows (orderkey not divisible by 3) on the
    * key; union + window keeps exactly one row per key with delta
    * precedence — the one-shuffle distributed upsert. */
  def etlMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        Core.cents(col("o_totalprice")).as("price_cents"),
        col("o_orderpriority"), lit(1).as("_prec"))
    val delta = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        Core.cents(col("o_totalprice") * 1.1).as("price_cents"),
        lit("MERGED").as("o_orderpriority"), lit(0).as("_prec"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("_prec").asc)
    base.unionByName(delta)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
        col("o_orderpriority"))
  }

  /** #24 — LoadType.INCREMENTAL: existing = pre-1997 orders; incoming =
    * the full feed re-delivered with a NEW marker; only rows whose key is
    * absent from existing are inserted (left-anti), then union. */
  def etlIncremental(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val cutoff = lit("1997-01-01").cast("timestamp")
    val existing = orders.filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"),
        Core.cents(col("o_totalprice")).as("price_cents"),
        col("o_orderpriority"), lit(false).as("is_new"))
    val incoming = orders
      .select(col("o_orderkey"),
        Core.cents(col("o_totalprice")).as("price_cents"),
        lit("NEW").as("o_orderpriority"), lit(true).as("is_new"))
    val inserted = incoming.join(
      existing.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
    existing.unionByName(inserted)
  }

  /** #25 — standardize_dates: multi-format date strings (format chosen by
    * key mod 4, mirroring a messy feed) parsed by trying the reference's
    * format list in order (etl_manager.py:511); first match wins, no
    * match ⇒ NULL. Pure narrow pipeline. */
  def etlStandardizeDates(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables(s, dir, "orders")
      .withColumn("raw_date",
        when(col("o_orderkey") % 4 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(col("o_orderkey") % 4 === 1,
          date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .when(col("o_orderkey") % 4 === 2,
          date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")))
    raw.select(
      col("o_orderkey"), col("raw_date"),
      date_format(
        coalesce(Transforms.dateFormats.map(f =>
          try_to_timestamp(col("raw_date"), lit(f)).cast("date")): _*),
        "yyyy-MM-dd").as("std_date"))
  }

  /** etl_scd2 — [[Transforms.scd2]] over each customer's order history
    * (orders as observed "versions" of the customer): valid_from/
    * valid_to intervals + is_current, one window shuffle. Version time
    * gets the order key as a unique low-order component (same total
    * order as q16). */
  def etlScd2(s: SparkSession, dir: String): DataFrame = {
    val versions = Tables(s, dir, "orders").select(
      col("o_custkey"),
      (unix_micros(col("o_orderdate").cast("timestamp")) +
        col("o_orderkey")).as("version_us"),
      Core.cents(col("o_totalprice")).as("price_cents"))
    Transforms.scd2(versions, Seq(col("o_custkey")), col("version_us"))
  }

  /** etl_cdc_apply — [[Transforms.cdcApply]]: lineitem recast as a
    * change stream per part (ship date orders the changes; orderkey +
    * linenumber is the unique tie-break; returned lines act as
    * deletes), collapsed to the final per-part state. */
  def etlCdcApply(s: SparkSession, dir: String): DataFrame = {
    val changes = Tables(s, dir, "lineitem").select(
      col("l_partkey"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("version_us"),
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", "D")
        .when(col("l_linestatus") === "O", "U")
        .otherwise("I").as("op"),
      Core.cents(col("l_quantity")).as("qty_cents"),
      Core.cents(col("l_extendedprice")).as("price_cents"))
    Transforms.cdcApply(changes, Seq(col("l_partkey")),
      Seq(col("version_us"), col("l_orderkey"), col("l_linenumber")),
      col("op"))
  }

  /** Snapshot instant for etl_scd2_snapshot: 1996-07-01T00:00:00Z in
    * the scd2 table's µs+orderkey version grid. */
  val SnapshotUs: Long = 836179200000000L

  /** etl_scd2_snapshot — [[Transforms.scd2Snapshot]]: the state of
    * every customer's order history as of mid-1996 (time travel over
    * the etl_scd2 output). */
  def etlScd2Snapshot(s: SparkSession, dir: String): DataFrame =
    Transforms.scd2Snapshot(etlScd2(s, dir), lit(SnapshotUs))

  /** layout_zorder — [[graft.operators.ZOrder.zValue]] over the
    * lineitem (part, supplier) pair: the Morton key a z-ordered write
    * clusters files by, emitted per row so the oracle replays the bit
    * interleave exactly (round-4, §2d). */
  def layoutZorder(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"),
      graft.operators.ZOrder.zValue(col("l_partkey"), col("l_suppkey"))
        .as("zv"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> layoutZorder,
    "etl_cdc_apply" -> etlCdcApply,
    "etl_scd2_snapshot" -> etlScd2Snapshot,
    "etl_scd2" -> etlScd2,
    "etl_bronze_cleanse" -> etlBronzeCleanse,
    "etl_merge_upsert" -> etlMergeUpsert,
    "etl_incremental" -> etlIncremental,
    "etl_standardize_dates" -> etlStandardizeDates)

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" -> s"""
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        ${graft.operators.ZOrder.zValueSql("l_partkey", "l_suppkey")} AS zv
      FROM lineitem""",
    "etl_cdc_apply" -> """
      WITH c AS (
        SELECT l_partkey, epoch_us(l_shipdate) AS version_us, l_orderkey,
          l_linenumber,
          CASE WHEN l_returnflag = 'R' THEN 'D'
               WHEN l_linestatus = 'O' THEN 'U'
               ELSE 'I' END AS op,
          CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM lineitem),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY l_partkey
          ORDER BY version_us DESC, l_orderkey DESC, l_linenumber DESC)
          AS _rn
        FROM c)
      SELECT l_partkey, version_us, l_orderkey, l_linenumber, op,
        qty_cents, price_cents
      FROM r WHERE _rn = 1 AND op <> 'D'""",
    "etl_scd2_snapshot" -> s"""
      WITH v AS (
        SELECT o_custkey,
          epoch_us(o_orderdate) + o_orderkey AS version_us,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        FROM orders),
      s AS (
        SELECT *, version_us AS valid_from,
          lead(version_us) OVER (PARTITION BY o_custkey
            ORDER BY version_us ASC) AS valid_to
        FROM v)
      SELECT o_custkey, version_us, price_cents, valid_from, valid_to,
        valid_to IS NULL AS is_current
      FROM s
      WHERE valid_from <= $SnapshotUs
        AND (valid_to IS NULL OR valid_to > $SnapshotUs)""",
    "etl_scd2" -> """
      WITH v AS (
        SELECT o_custkey,
          epoch_us(o_orderdate) + o_orderkey AS version_us,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        FROM orders),
      s AS (
        SELECT *, version_us AS valid_from,
          lead(version_us) OVER (PARTITION BY o_custkey
            ORDER BY version_us ASC) AS valid_to
        FROM v)
      SELECT o_custkey, version_us, price_cents, valid_from, valid_to,
        valid_to IS NULL AS is_current
      FROM s""",
    "etl_bronze_cleanse" -> """
      WITH cleaned AS (
        SELECT doc_id, trim(text) AS text, upper(trim(lang)) AS lang,
          CASE WHEN trim(source) IN
            ('', 'NULL', 'null', 'N/A', 'n/a', 'NA', 'None', 'none')
            THEN NULL ELSE trim(source) END AS source,
          n_chars
        FROM documents),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY source ASC NULLS FIRST, text ASC) AS _rn
        FROM cleaned)
      SELECT doc_id, CAST(length(text) AS INTEGER) AS text_len, lang,
        source, n_chars
      FROM ranked WHERE _rn = 1""",
    "etl_merge_upsert" -> """
      WITH base AS (
        SELECT o_orderkey, o_custkey,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
          o_orderpriority, 1 AS _prec
        FROM orders WHERE o_orderkey % 3 <> 0),
      delta AS (
        SELECT o_orderkey, o_custkey,
          CAST(round(o_totalprice*1.1*100) AS BIGINT) AS price_cents,
          'MERGED' AS o_orderpriority, 0 AS _prec
        FROM orders WHERE o_orderkey % 2 = 0),
      unioned AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
          ORDER BY _prec ASC) AS _rn
        FROM unioned)
      SELECT o_orderkey, o_custkey, price_cents, o_orderpriority
      FROM ranked WHERE _rn = 1""",
    "etl_incremental" -> """
      WITH existing AS (
        SELECT o_orderkey,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
          o_orderpriority, false AS is_new
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
      incoming AS (
        SELECT o_orderkey,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
          'NEW' AS o_orderpriority, true AS is_new
        FROM orders)
      SELECT * FROM existing
      UNION ALL
      SELECT * FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM existing e
                        WHERE e.o_orderkey = i.o_orderkey)""",
    "etl_standardize_dates" -> """
      WITH raw AS (
        SELECT o_orderkey,
          CASE
            WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
            WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
            WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%d/%m/%Y')
            ELSE strftime(o_orderdate, '%Y%m%d')
          END AS raw_date
        FROM orders)
      SELECT o_orderkey, raw_date,
        strftime(CAST(coalesce(
          try_strptime(raw_date, '%Y-%m-%d'),
          try_strptime(raw_date, '%m/%d/%Y'),
          try_strptime(raw_date, '%d/%m/%Y'),
          try_strptime(raw_date, '%Y%m%d')) AS DATE), '%Y-%m-%d') AS std_date
      FROM raw""")
}
