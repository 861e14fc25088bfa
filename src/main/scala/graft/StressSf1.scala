package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale checkpoint (round-18, PLANS.md): the 15 heaviest driver
  * entries run at sf0.1 AND at a synthesized sf1 (10× sf0.1) in one
  * JVM, reporting per-entry ratios — the cliff detector sf0.1 alone
  * cannot be (LSH bucket caps, window-vs-hash-agg crossovers, commit
  * machinery constants). 10× data ⇒ ≈10× wall is healthy on
  * local[32]; a >12× scaler names a super-linear stage.
  *
  * sf1 synthesis: each table unions 10 key-remapped replicas of its
  * sf0.1 parquet —
  *  - fact keys offset per replica (l_orderkey / o_orderkey /
  *    doc_id / vec_id / event ids), so joins and groupings see 10×
  *    the key space, not 10-fold duplicates of one;
  *  - dimension tables stay as-is (regions/nations/customers don't
  *    grow 10× when a warehouse grows 10× — and un-offset FKs keep
  *    referential integrity);
  *  - document text salts with the replica tag (cross-replica exact
  *    dups would otherwise explode every dedup pair list
  *    quadratically — unrepresentative of a real 10× corpus);
  *  - embeddings perturb one coordinate per replica (identical
  *    vectors would put cosine-1.0 10-cliques under every ANN/dedup
  *    entry).
  *
  * Run: runMain graft.StressSf1   (SPARK_GRAFT_SF_DIR = the sf0.1
  * dir; SPARK_GRAFT_SF1_DIR overrides the synthesis target).
  */
object StressSf1 {

  val Entries: Seq[String] = Seq(
    "txn_scd2_apply", "mv_general", "mv_incremental", "txn_stats_agg",
    "txn_sql_dml", "dedup_incremental", "txn_sql_changes", "txn_dml",
    "txn_dml_mor", "knn_graph", "dedup_keep_best", "txn_generated",
    "graph_components", "dedup_dropdups", "dedup_clusters")

  private def replicate(spark: SparkSession, src: String, dst: String)
      : Unit = {
    val f = new java.io.File(dst)
    if (new java.io.File(f, "_SUCCESS_SF1").exists()) {
      println(s"[stress-sf1] reusing synthesized corpus at $dst")
      return
    }
    f.mkdirs()
    // (table, offset columns, text-salt column, perturb-vector column)
    val specs: Seq[(String, Seq[String], Option[String], Option[String])] =
      Seq(
        ("lineitem", Seq("l_orderkey"), None, None),
        ("orders", Seq("o_orderkey"), None, None),
        ("customer", Nil, None, None),
        ("supplier", Nil, None, None),
        ("part", Nil, None, None),
        ("nation", Nil, None, None),
        ("region", Nil, None, None),
        ("events", Seq("event_id"), None, None),
        ("documents", Seq("doc_id"), Some("text"), None),
        ("embeddings", Seq("vec_id"), None, Some("embedding")))
    specs.foreach { case (t, offs, salt, perturb) =>
      // RAW parquet copy (not Tables(): its events normalization
      // would change the stored encoding the readers key off)
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out = new java.io.File(f, s"$t.parquet").getAbsolutePath
      if (offs.isEmpty && salt.isEmpty && perturb.isEmpty) {
        base.write.mode("overwrite").parquet(out)
      } else {
        val maxes = offs.map(c =>
          c -> (base.agg(max(col(c))).head().getLong(0) + 1L)).toMap
        val replicas = (0 until 10).map { i =>
          var d: DataFrame = base
          offs.foreach(c =>
            d = d.withColumn(c, col(c) + lit(i.toLong * maxes(c))))
          salt.foreach(c => if (i > 0)
            d = d.withColumn(c, concat(col(c), lit(s" r$i"))))
          perturb.foreach(c => if (i > 0)
            d = d.withColumn(c, expr(
              s"transform($c, (x, j) -> IF(j = 0, " +
                s"CAST(x + ${i.toDouble / 1000.0} AS FLOAT), x))")))
          d
        }
        replicas.reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(out)
      }
      println(s"[stress-sf1] synthesized $t")
    }
    new java.io.File(f, "_SUCCESS_SF1").createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.GraftCatalog")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    replicate(spark, sf01, sf1)

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      require(n > 0, s"$name returned 0 rows at $dir")
      spark.sharedState.cacheManager.clearCache()
      s
    }
    // one warm pass at sf0.1 primes codegen/class-load costs out of
    // both measured passes
    Entries.foreach(run(_, sf01))
    val at01 = Entries.map(e => e -> run(e, sf01)).toMap
    val at1 = Entries.map(e => e -> run(e, sf1)).toMap
    println(f"| entry | sf0.1 s | sf1 s | ratio |")
    println(f"| --- | --- | --- | --- |")
    Entries.sortBy(e => -at1(e)).foreach { e =>
      println(f"| $e | ${at01(e)}%.2f | ${at1(e)}%.2f | " +
        f"${at1(e) / at01(e)}%.1f× |")
    }
    println(f"[stress-sf1] totals: sf0.1 ${at01.values.sum}%.1f s, " +
      f"sf1 ${at1.values.sum}%.1f s, ratio " +
      f"${at1.values.sum / at01.values.sum}%.1f×")
    spark.stop()
  }
}
