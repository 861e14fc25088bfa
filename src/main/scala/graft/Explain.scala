package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named
  * queries (or all). Used to verify scan pruning (PushedFilters /
  * ReadSchema), broadcast vs shuffle joins, and WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--summary")) {
      // one row per query: shuffle count, broadcast count, scans with
      // pushed filters — the efficiency audit
      println(f"${"query"}%-28s shuffles bcasts scans pushed")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          def n(re: String): Int = re.r.findAllIn(plan).size
          println(f"$name%-28s ${n("Exchange hashpartitioning")}%8d " +
            f"${n("BroadcastExchange")}%6d ${n("FileScan parquet")}%5d " +
            f"${n("PushedFilters: \\[[^]]")}%6d")
        } catch {
          case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage}")
        }
      }
    } else {
      val wanted =
        if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
      // SPARK_GRAFT_EXPLAIN_DIR: write each query's formatted plan to
      // <dir>/<name><SPARK_GRAFT_EXPLAIN_SUFFIX>.txt instead of stdout
      // (round-21 deliverable: committed before/after plan files)
      val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
      val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
      wanted.foreach { name =>
        outDir match {
          case Some(d) =>
            val plan = SparkEntry.queries(name)(spark, sfDir)
              .queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode
                  .fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$d/$name$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"wrote $d/$name$suffix.txt")
          case None =>
            println(s"\n========== $name ==========")
            SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        }
      }
    }
    spark.stop()
  }
}
