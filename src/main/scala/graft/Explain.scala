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
      wanted.foreach { name =>
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
