package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** CROSS-PROCESS commit torture (round-18, PLANS.md): every prior
  * multi-writer test interleaved writers inside ONE JVM (the
  * deterministic `testBeforeClaim` hook), so the claim loop's
  * cross-process behavior — two independent drivers racing
  * create-if-absent on the same version file (TxLog.tryWrite's
  * dot-tmp + atomic-rename primitive) — was asserted, not
  * demonstrated. This main demonstrates it: N child JVMs, each its
  * own SparkSession over the SAME log directory, each committing
  * `commits` append batches tagged (writer, seq). The parent then
  * proves from the log alone:
  *
  *  - NO LOST COMMIT: the head version is exactly
  *    `writers × commits` (v0 is the parent's create) — every claim
  *    that returned success is a distinct version file;
  *  - NO LOST SLICE: every (writer, seq) pair appears EXACTLY
  *    `rowsPerCommit` times — a clobbered commit would lose a slice,
  *    a double-applied rebase would double one;
  *  - LOG COHERENCE: versions are contiguous and every live file is
  *    on disk.
  *
  * Usage:
  *   runMain graft.StressMultiWriter               (parent: forks 2)
  *   graft.StressMultiWriter child <dir> <id> <n>  (internal)
  * Env: SPARK_GRAFT_MW_WRITERS / _COMMITS / _ROWS override the shape.
  *
  * The child JVMs launch with the SAME JDK-17 --add-opens set
  * build.sbt forks with (SparkSession outside spark-submit needs
  * them). Exit 0 = all invariants held.
  */
object StressMultiWriter {

  val RowsPerCommit = 500

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("child") =>
      child(args(1), args(2).toInt, args(3).toInt)
    case _ => parent()
  }

  /** One independent writer process: `n` tagged append commits. The
    * claim-loop contention handling (rebase + retry) is inside
    * commitAppend — a child only fails when the loop gives up. */
  def child(dir: String, id: Int, n: Int): Unit = {
    val spark = session(2)
    import spark.implicits._
    (0 until n).foreach { seq =>
      val batch = (0 until RowsPerCommit)
        .map(r => (id, seq, r.toLong)).toDF("writer", "seq", "r")
      TxLog.commitAppend(spark, dir, batch)
    }
    println(s"""{"writer":$id,"commits":$n}""")
    spark.stop()
  }

  /** The --add-opens set a bare JVM needs to host Spark 4 on JDK 17
    * (mirrors build.sbt / spark-launcher's JavaModuleOptions). */
  def jdk17Opens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork a child writer JVM against `dir`. Inherits this process's
    * classpath; output is streamed to our stdout. */
  def forkChild(dir: String, id: Int, commits: Int): Process = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val cmd: Seq[String] =
      Seq(javaBin) ++ jdk17Opens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.StressMultiWriter", "child", dir, id.toString,
        commits.toString)
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  /** Re-verifiable invariant check over the finished log; returns
    * error strings (empty = clean). Shared with Round18Spec. */
  def check(spark: SparkSession, dir: String, writers: Int,
      commits: Int): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val snap = TxLog.snapshot(spark, dir)
    val expectedHead = writers.toLong * commits // v0 = create
    if (snap.version != expectedHead)
      errs += s"head ${snap.version} != $expectedHead (lost/extra commit)"
    val counts = TxLog.read(spark, dir)
      .groupBy("writer", "seq").count().collect()
    if (counts.length != writers * commits)
      errs += s"${counts.length} distinct (writer,seq) slices, " +
        s"expected ${writers * commits}"
    counts.filter(_.getLong(2) != RowsPerCommit.toLong).take(3)
      .foreach(r => errs += s"slice (${r.get(0)},${r.get(1)}) has " +
        s"${r.getLong(2)} rows, expected $RowsPerCommit")
    // every live file is on disk (a clobbered claim would register
    // files its loser deleted in abort cleanup)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gone = snap.files.filterNot(f => fs.exists(
      new org.apache.hadoop.fs.Path(dir, f.path)))
    if (gone.nonEmpty)
      errs += s"${gone.size} live files missing on disk " +
        s"(first: ${gone.take(2).map(_.path).mkString(", ")})"
    errs.toSeq
  }

  def parent(): Unit = {
    val writers = sys.env.getOrElse("SPARK_GRAFT_MW_WRITERS", "2").toInt
    val commits = sys.env.getOrElse("SPARK_GRAFT_MW_COMMITS", "8").toInt
    val spark = session(4)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mwstress").toString + "/t"
    // v0: the parent creates the (empty) table so children race pure
    // appends, never the create itself
    TxLog.commitOverwrite(spark, dir,
      Seq.empty[(Int, Int, Long)].toDF("writer", "seq", "r"))
    val t0 = System.nanoTime()
    val procs = (0 until writers).map(forkChild(dir, _, commits))
    val exits = procs.map(_.waitFor())
    val secs = (System.nanoTime() - t0) / 1e9
    exits.zipWithIndex.filter(_._1 != 0).foreach { case (c, i) =>
      println(s"[stress-mw] child $i exited $c"); sys.exit(1)
    }
    val errs = check(spark, dir, writers, commits)
    errs.foreach(e => println(s"[stress-mw] VIOLATION: $e"))
    println(f"[stress-mw] $writers processes × $commits commits " +
      f"(${writers * commits} total) in $secs%.1f s — " +
      (if (errs.isEmpty) "all invariants held" else "FAILED"))
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
