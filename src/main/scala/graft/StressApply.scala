package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Scale-stress for the CDC-APPLY write paths (not part of the driver
  * contract): measures the WRITE AMPLIFICATION of copy-on-write
  * [[TxLog.applyChanges]] vs merge-on-read [[TxLog.applyChangesMor]]
  * on scattered-key directive batches — the workload a change-feed
  * FOLLOWER sees continuously (`followStream`), and the reason the
  * MoR form exists. Claims:
  *
  *  1. with directive keys scattered across every file, CoW rewrites
  *     the whole touched set each batch (bytes written ≈ table size),
  *     while MoR writes vector pairs + replacement images (bytes
  *     written ≈ directive size) — orders of magnitude apart, and the
  *     gap GROWS with file size at fixed directive count;
  *  2. both forms land the identical logical state (xxhash64-summed
  *     row signature parity after each batch);
  *  3. MoR batch latency is flat-ish in table size for fixed
  *     directive count; CoW latency tracks the touched-file bytes.
  *
  * Bytes written are read from the log itself (TxFile.bytes, recorded
  * at commit time), not estimated.
  *
  * Usage: runMain graft.StressApply [rows] [files] [batches] [keysPerBatch]
  */
object StressApply {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Multiset signature: (row count, xor of row hashes, exact decimal
    * sum of row hashes). The decimal sum breaks xor's even-multiplicity
    * blindness (two extra copies of a row xor away; they cannot sum
    * away and count away simultaneously). */
  private def sig(spark: SparkSession, dir: String): String = {
    val d = TxLog.read(spark, dir)
    d.select(xxhash64(d.columns.map(col).toSeq: _*).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"),
        sum(col("h").cast("decimal(38,0)")))
      .head().toString
  }

  /** Bytes currently on disk under the table's vector dir. */
  private def dvBytes(dir: String): Long = {
    val d = new java.io.File(s"$dir/${TxLog.DvDir}")
    if (!d.exists()) 0L
    else d.listFiles().filter(_.isFile).map(_.length).sum
  }

  /** (new data files, their bytes, their rows) landed by commits in
    * (since, head] — NEW paths only, so a MoR commit's re-registered
    * touched entries (same path, new vector pointer) do not count as
    * writes. Vector bytes are measured separately from disk. */
  private def written(spark: SparkSession, dir: String,
      since: Long): (Long, Long, Long) = {
    val head = TxLog.snapshot(spark, dir)
    val before = TxLog.snapshot(spark, dir, Some(since))
    val beforePaths = before.files.map(_.path).toSet
    val fresh = head.files.filterNot(f => beforePaths(f.path))
    (fresh.size.toLong, fresh.flatMap(_.bytes).sum,
      fresh.map(_.rows).sum)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(600000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val batches = args.lift(2).map(_.toInt).getOrElse(5)
    val keys = args.lift(3).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def freshTable(): String = {
      val dir = Files.createTempDirectory("stress_apply").toString + "/t"
      val df = spark.range(rows.toLong)
        .select(col("id"),
          concat(lit("payload_"), col("id")).as("name"),
          (col("id") % 97).as("bucket"))
        .repartitionByRange(nFiles, col("id"))
      TxLog.commitOverwrite(spark, dir, df, statsCols = Seq("id"))
      dir
    }

    // directives scattered uniformly: one key per rows/keys stride,
    // shifted per batch — every file is touched every batch
    def directives(b: Int): DataFrame = {
      val stride = rows / keys
      spark.range(keys.toLong)
        .select((col("id") * stride + b).as("id"),
          concat(lit(s"updated_b${b}_"), col("id")).as("name"),
          (col("id") % 97).as("bucket"),
          lit(false).as("del"))
    }

    val cow = freshTable()
    val mor = freshTable()
    println(s"table: $rows rows, $nFiles files; " +
      s"$batches batches x $keys scattered keys")

    var parity = true
    val results = (0 until batches).map { b =>
      val d = directives(b).cache()
      d.count()
      val vCow = TxLog.snapshot(spark, cow).version
      val (_, tCow) = time(TxLog.applyChanges(spark, cow, d,
        Seq("id"), "del", statsCols = Seq("id")))
      val wCow = written(spark, cow, vCow)
      val vMor = TxLog.snapshot(spark, mor).version
      val dv0 = dvBytes(mor)
      val (_, tMor) = time(TxLog.applyChangesMor(spark, mor, d,
        Seq("id"), "del", statsCols = Seq("id")))
      val wMor = written(spark, mor, vMor)
      val dvDelta = dvBytes(mor) - dv0
      val same = sig(spark, cow) == sig(spark, mor) // once per side
      parity &= same
      d.unpersist()
      println(f"batch $b: CoW ${tCow}%6.2f s, ${wCow._1}%3d files, " +
        f"${wCow._2 / 1e6}%8.2f MB, ${wCow._3}%8d rows | " +
        f"MoR ${tMor}%6.2f s, ${wMor._1}%3d files, " +
        f"${(wMor._2 + dvDelta) / 1e6}%8.2f MB (${dvDelta / 1e6}%.2f dv), " +
        f"${wMor._3}%8d rows | " +
        s"parity $same")
      (tCow, wCow._2, tMor, wMor._2 + dvDelta)
    }
    val totCowB = results.map(_._2).sum / 1e6
    val totMorB = results.map(_._4).sum / 1e6
    println(f"TOTAL bytes written: CoW ${totCowB}%.1f MB vs " +
      f"MoR ${totMorB}%.1f MB (amplification x${totCowB / totMorB}%.1f); " +
      s"state parity every batch: $parity")
    // MoR debt is bounded and collectable: one compact folds vectors
    val (_, tc) = time(TxLog.compact(spark, mor, targetFiles = nFiles))
    println(f"mor compact: ${tc}%.2f s; parity after: " +
      s"${sig(spark, cow) == sig(spark, mor)}")
    spark.stop()
  }
}
