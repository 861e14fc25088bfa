package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{MaterializedAgg, TxLog}

/** Phase-level profile of the `mv_general` bench entry (not part of
  * the driver contract) — written to chase the round-18 observation
  * that mv_general swings ~6× under box load (9.4 s idle vs 58.7 s in
  * the driver's post-commit rerun) while most entries swing ~1.2×.
  * The entry is a full LIFECYCLE (5 commits + a refresh + a read), so
  * the wall time is a sum of phases with very different resource
  * shapes; this main times each phase separately so a loaded rerun
  * shows WHERE the inflation concentrates (commit machinery fsync/
  * rename vs shuffle/agg compute vs the COUNT-DISTINCT dirty-key
  * recompute).
  *
  * Usage: runMain graft.StressMvProfile [sfDir] [reps]
  */
object StressMvProfile {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    (0 until reps).foreach { rep =>
      val t = Tables(s, sfDir, "lineitem").select(
        col("l_orderkey").as("k"),
        col("l_linenumber").as("ln"),
        col("l_quantity").cast("int").as("qty"),
        graft.queries.Core.cents(col("l_extendedprice")).as("pc"),
        col("l_returnflag").as("rf"))
      val root = Files.createTempDirectory("graft_mvprof")
      val src = s"$root/src"
      val mv = s"$root/mv"
      val phases = Seq(
        "overwrite" -> time(TxLog.commitOverwrite(s, src,
          t.repartitionByRange(8, col("k")), statsCols = Seq("k"))),
        "mv_create" -> time(MaterializedAgg.create(s, src, mv,
          keys = Seq("rf"), sums = Seq("pc"), avgs = Seq("qty"),
          others = Map("distinct_part" -> "count(distinct k % 1000)"))),
        "delete_cow" -> time(TxLog.delete(s, src, col("qty") >= 48)),
        "update_cow" -> time(TxLog.update(s, src, col("k") <= 1000,
          Map("pc" -> (col("pc") + 100)))),
        "append" -> time(TxLog.commitAppend(s, src,
          t.filter(col("k") % 101 === 0)
            .select((col("k") + 3000000000L).as("k"), col("ln"),
              lit(5).as("qty"), lit(0L).as("pc"), lit("Z").as("rf")))),
        "refresh" -> time(MaterializedAgg.refresh(s, mv)),
        "read" -> time(TxLog.read(s, mv).collect()))
      val total = phases.map(_._2).sum
      val body = phases.map { case (n, sec) =>
        f""""$n":$sec%.2f""" }.mkString(",")
      println(f"""MVPROFILE {"rep":$rep,$body,"total":$total%.2f}""")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    spark.stop()
  }
}
