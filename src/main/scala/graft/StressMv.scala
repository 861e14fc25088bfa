package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{MaterializedAgg, TxLog}

/** Scale-stress for incremental materialized-aggregate maintenance
  * (not part of the driver contract): a logged source table of `rows`
  * rows across `files` range-laid files carries a per-group view
  * (COUNT / SUM / MIN / MAX over ~`groups` keys). Trickle DML batches
  * (scattered deletes + appends) hit the source; each batch is folded
  * in by [[MaterializedAgg.refresh]] and compared against a FULL
  * recompute, measuring:
  *
  *  1. refresh wall time vs full-recompute wall time (the point of
  *     the operator: delta cost, not corpus cost);
  *  2. correctness parity after every batch (view ≡ recompute,
  *     xxhash64 multiset signature);
  *  3. view write amplification: bytes written per refresh from the
  *     view log's own TxFile.bytes — touched-key files only.
  *
  * Usage: runMain graft.StressMv [rows] [files] [groups] [batches] [keysPerBatch]
  */
object StressMv {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def sig(df: DataFrame): String =
    df.select(xxhash64(df.columns.map(col).toSeq: _*).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"),
        sum(col("h").cast("decimal(38,0)")))
      .head().toString

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(600000L)
    val files = args.lift(1).map(_.toInt).getOrElse(8)
    val groups = args.lift(2).map(_.toInt).getOrElse(1000)
    val batches = args.lift(3).map(_.toInt).getOrElse(5)
    val keysPerBatch = args.lift(4).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft_stress_mv")
    val src = s"$root/src"
    val mv = s"$root/mv"

    val mvSums = s"$root/mv_sums"
    // grp-range layout + grp stats: the dirty-key recompute's pruned
    // read can actually skip files (a real deployment lays the table
    // out by its reporting key for exactly this)
    val base = spark.range(rows).select(
      col("id"),
      (col("id") % groups).as("grp"),
      (col("id") * 31 % 997).as("v"))
    TxLog.commitOverwrite(spark, src,
      base.repartitionByRange(files, col("grp")),
      statsCols = Seq("id", "grp"))
    val (_, tCreate) = time(MaterializedAgg.create(spark, src, mv,
      keys = Seq("grp"), sums = Seq("v"), mins = Seq("v"),
      maxs = Seq("v")))
    val (_, tCreate2) = time(MaterializedAgg.create(spark, src, mvSums,
      keys = Seq("grp"), sums = Seq("v")))
    println(f"create: minmax $tCreate%.2f s, sums-only $tCreate2%.2f s " +
      f"($groups groups over $rows%,d rows)")

    def recompute(): DataFrame = MaterializedAgg.aggregate(
      TxLog.read(spark, src), Seq("grp"), Seq("v"), Seq("v"), Seq("v"))

    var nextId = rows
    val rnd = new scala.util.Random(14)
    (1 to batches).foreach { b =>
      // retractions concentrated in a narrow band of groups (the
      // realistic shape: corrections hit one source/partition, not
      // uniformly everything) — scattered ROW positions within it,
      // landing MERGE-ON-READ as a trickle does at scale. Appends
      // stay corpus-wide.
      val g0 = rnd.nextInt(groups - 20)
      val band = (g0 until g0 + 20).map(_.toLong)
      val delIds = Seq.fill(keysPerBatch)(
        band(rnd.nextInt(band.size)) +
          groups.toLong * rnd.nextInt((rows / groups).toInt))
      val (_, tDel) = time(TxLog.deleteMor(spark, src,
        col("id").isin(delIds: _*)))
      val adds = spark.range(nextId, nextId + keysPerBatch).select(
        col("id"), (col("id") % groups).as("grp"),
        (col("id") * 17 % 997).as("v"))
      nextId += keysPerBatch
      val (_, tAdd) = time(TxLog.commitAppend(spark, src, adds))
      val mvHead0 = TxLog.snapshot(spark, mv).version
      val (_, tRefresh) = time(MaterializedAgg.refresh(spark, mv))
      val (_, tRefreshSums) = time(MaterializedAgg.refresh(spark, mvSums))
      val (fullSig, tFull) = time(sig(recompute()))
      val viewSig = sig(TxLog.read(spark, mv))
      val parity = viewSig == fullSig
      val sumsParity = sig(TxLog.read(spark, mvSums)) ==
        sig(recompute().drop("min_v", "max_v"))
      // rows the refresh wrote into the view, from the view's log
      val written = TxLog.history(spark, mv)
        .filter(col("version") > mvHead0)
        .agg(sum(col("rows_added"))).head().getLong(0)
      println(f"batch $b: dml ${tDel + tAdd}%.2f s, refresh minmax " +
        f"$tRefresh%.2f s / sums-only $tRefreshSums%.2f s vs full " +
        f"recompute $tFull%.2f s, view rows rewritten $written%,d / " +
        f"$groups groups, parity $parity/$sumsParity")
      require(parity && sumsParity,
        s"view diverged from recompute at batch $b")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    spark.stop()
  }
}
