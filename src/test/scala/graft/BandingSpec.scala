package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Banding

/** [[graft.operators.Banding]] must be EXACTLY the naive
  * `Window.partitionBy(key).orderBy(value, tiebreak)` semantics — same
  * row_number, same ntile buckets — while never sorting the row
  * relation inside the key partitions (that plan property is guarded
  * in PlanAuditSpec; this suite pins the value equivalence, including
  * the tie-heavy and tiny-partition edges where the bucket arithmetic
  * is easiest to get wrong). */
class BandingSpec extends SparkSpec {

  // keys of very different sizes; value domain of 13 → heavy ties
  private lazy val data: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(1 -> 1, 2 -> 37, 3 -> 500).flatMap { case (k, n) =>
      (1 to n).map(i => (s"k$k", (i * 7919) % 13, i.toLong))
    }.toDF("key", "value", "tb")
  }

  private def cols(d: DataFrame) =
    d.select("key", "value", "tb", "rn", "n")

  test("withRowNumber matches the naive window exactly (heavy ties, asc+desc)") {
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("value").desc else col("value").asc
      val w = Window.partitionBy(col("key")).orderBy(ord, col("tb").asc)
      val naive = data
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("key"))))
      val ours = Banding.withRowNumber(data, Seq("key"), "value", "tb",
        descValue = desc, rnCol = "rn", nCol = "n")
      assert(cols(ours).except(cols(naive)).count() == 0 &&
        cols(naive).except(cols(ours)).count() == 0,
        s"desc=$desc: banded row_number diverges from the window form")
    }
  }

  test("ntileOf matches ntile(k) for k=1..7 across partition sizes 1..40") {
    val s = spark
    import s.implicits._
    val d = (1 to 40).flatMap(n => (1 to n).map(i => (s"p$n", i.toLong)))
      .toDF("key", "tb")
    val w = Window.partitionBy(col("key")).orderBy(col("tb").asc)
    val base = d
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("key"))))
    for (k <- 1 to 7) {
      val bad = base
        .withColumn("expect", ntile(k).over(w).cast("long"))
        .withColumn("got", Banding.ntileOf(col("rn"), col("n"), k))
        .filter(col("expect") =!= col("got"))
      assert(bad.isEmpty,
        s"k=$k: ${bad.limit(5).collect().mkString("; ")}")
    }
  }
}
