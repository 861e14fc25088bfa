package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job/stage profiler for named bench entries (round 21
  * optimization work; NOT part of the driver contract). For each named
  * query it runs the same timed shape as Bench (fn + count + release)
  * with a listener attached, then prints every Spark job's wall time
  * and call site plus aggregate stage metrics — the "which phase of
  * this lifecycle is the wall" evidence the optimization guide (§1)
  * asks for before touching anything.
  *
  * Usage: runMain graft.ProfileQueries q1,q2,...
  */
object ProfileQueries {

  private final case class JobRec(id: Int, var started: Long = 0L,
    var ended: Long = 0L, var site: String = "", var desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.sources.GraftCatalog")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("txn_scd2_apply"))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    // per-SQL-action attribution: funcName + duration + plan head
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, String)]()
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val plan = qe.executedPlan.toString
        val head = plan.linesIterator
          .filter(l => l.nonEmpty && !l.trim.startsWith("+-") &&
            !l.trim.startsWith(":"))
          .take(1).mkString("")
        val nEx = "Exchange".r.findAllIn(plan).size
        val scans = "FileScan|Scan ".r.findAllIn(plan).size
        actions.add((funcName, durationNs,
          s"ex=$nEx scans=$scans ${head.take(110)}"))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    @volatile var stageTasks = 0L
    @volatile var stageShuffleRead = 0L
    @volatile var stageShuffleWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, started = e.time)
        r.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.ended = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTasks += e.stageInfo.numTasks
        stageShuffleRead +=
          e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        stageShuffleWrite +=
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    // warm pass first (JIT/codegen/footers), mirroring Bench's protocol
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        try df.count() finally graft.operators.Dedup.release(df)
      } catch { case _: Throwable => () }
    }
    names.foreach { name =>
      jobs.clear(); stageTasks = 0; stageShuffleRead = 0; stageShuffleWrite = 0
      actions.clear()
      spark.listenerManager.register(qeListener)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        try df.count() finally graft.operators.Dedup.release(df)
      } catch { case e: Throwable =>
        println(s"ERROR $name: ${e.getMessage}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.listenerManager.unregister(qeListener)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(-_.durMs)
      val jobSum = recs.map(_.durMs).sum / 1e3
      println(f"\n===== $name wall=$wall%.2f s, ${recs.size} jobs " +
        f"(sum $jobSum%.2f s), $stageTasks tasks, " +
        f"shufR=${stageShuffleRead / 1e6}%.1f MB " +
        f"shufW=${stageShuffleWrite / 1e6}%.1f MB =====")
      val acts = actions.asScala.toSeq
      println(s"  -- ${acts.size} SQL actions " +
        f"(sum ${acts.map(_._2).sum / 1e9}%.2f s) --")
      acts.sortBy(-_._2).take(30).foreach { case (fn, ns, plan) =>
        println(f"  ${ns / 1e6}%8.0f ms  $fn%-18s $plan")
      }
      val byDesc = recs.groupBy(_.desc).view
        .mapValues(rs => (rs.size, rs.map(_.durMs).sum)).toSeq
        .sortBy(-_._2._2)
      println("  -- jobs by description --")
      byDesc.take(25).foreach { case (desc, (n, ms)) =>
        println(f"  $ms%7d ms  n=$n%-4d ${if (desc.isEmpty) "(none)" else desc}")
      }
    }
    spark.stop()
  }

  private implicit class JobOps(r: JobRec) {
    def durMs: Long = if (r.ended > 0) r.ended - r.started else 0L
  }
}
