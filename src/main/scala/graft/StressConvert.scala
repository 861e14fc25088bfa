package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** convertInPlace listing-scale stress (round-16, PLANS.md): adoption
  * of a MANY-DIRECTORY hive tree must not be bound by one driver-side
  * recursive iterator — past the top-level-dir threshold the walk
  * runs as a Spark job, one task per partition directory (the Delta
  * CONVERT design). This stress:
  *
  *  1. builds a 128-partition × 24-file tree (3,072 data files);
  *  2. registers one copy with the DISTRIBUTED walk (threshold
  *     forced to 0) and an identical copy with the SEQUENTIAL walk
  *     (threshold forced above 128), timing both;
  *  3. hard-fails unless the two registrations are IDENTICAL —
  *     same file list, same per-file rows/bytes, same partition
  *     columns, same recorded stats.
  *
  * Run: runMain graft.StressConvert
  */
object StressConvert {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](what: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress-convert] $what%-28s ${sec}%8.2f s")
      (r, sec)
    }

    val parts = 128
    val filesPerPart = 24
    val df = (0 until parts).flatMap(p =>
      (0 until filesPerPart * 4).map(i =>
        (p.toLong * 10000 + i, s"p$p", i.toLong)))
      .toDF("id", "part", "v")
      .repartition(filesPerPart, col("id"))
    val rootA = Files.createTempDirectory("graft_convA").toString + "/t"
    val rootB = Files.createTempDirectory("graft_convB").toString + "/t"
    timed(s"write tree ($parts dirs)") {
      df.write.partitionBy("part").parquet(rootA)
      // byte-identical second copy — parity below compares the
      // registered file lists verbatim
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(rootA), new java.io.File(rootB))
    }

    val saved = TxLog.ConvertListDirsThreshold
    try {
      TxLog.ConvertListDirsThreshold = 0 // force the Spark-job walk
      val (_, tDist) = timed("convert DISTRIBUTED walk") {
        TxLog.convertInPlace(spark, rootA, statsCols = Seq("id"))
      }
      TxLog.ConvertListDirsThreshold = parts + 1 // force the driver walk
      val (_, tSeq) = timed("convert SEQUENTIAL walk") {
        TxLog.convertInPlace(spark, rootB, statsCols = Seq("id"))
      }

      val a = TxLog.snapshot(spark, rootA)
      val b = TxLog.snapshot(spark, rootB)
      def canon(s: TxLog.TxSnapshot) =
        s.files.sortBy(_.path).map(fl =>
          (fl.path, fl.rows, fl.bytes, fl.stats.toSeq.sortBy(_._1)))
      require(a.partitionCols == Seq("part") &&
        b.partitionCols == Seq("part"),
        "partition columns diverged")
      // hash-partitioned tasks may hold no rows for a given part dir,
      // so the exact count is write-dependent — thousands of files
      // and every partition present is the claim under test
      require(a.files.size > parts * filesPerPart / 2 &&
        a.files.map(_.path.split('/').head).distinct.size == parts,
        s"unexpected tree shape: ${a.files.size} files")
      require(canon(a) == canon(b),
        "distributed and sequential walks registered different state")
      val n = TxLog.read(spark, rootA).count()
      require(n == df.count(), s"row count diverged: $n")
      println(f"[stress-convert] PARITY OK — ${a.files.size} files, " +
        f"dist ${tDist}%.2f s vs seq ${tSeq}%.2f s")
    } finally {
      TxLog.ConvertListDirsThreshold = saved
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(rootA).getParentFile)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(rootB).getParentFile)
    }
    spark.stop()
  }
}
