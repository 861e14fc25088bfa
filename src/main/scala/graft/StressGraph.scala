package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.operators.{Dedup, Graph}

/** Scale-stress harness for the similarity-graph family (not part of
  * the driver contract): builds the same controlled sf1 near-dup graph
  * as [[StressDedup]] (≈1.2M edges over ≈47k nodes with clique AND
  * chain shapes), materializes it to parquet, then times the three
  * graph operators the driver binds — degrees (single-pass explode
  * form), components (path-halved label propagation), and pagerank
  * (fixed budget vs tol early-stop, with per-round max |Δrank|).
  *
  * The scale-dependent claims this checks: degrees stays one pass over
  * the edge relation; pagerank's per-round state stays node-sized with
  * superseded checkpoints released (flat memory over rounds); the tol
  * stop reaches the fixed-budget answer in fewer edge-join rounds.
  *
  * Usage: runMain graft.StressGraph [baseDir] [copies] [tau] [iters]
  */
object StressGraph {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val tau = if (args.length > 2) args(2).toDouble else 0.6
    val iters = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same stressed corpus as StressDedup; edges materialized so every
    // operator stage reads real parquet, like the bench
    val edgePath = "/tmp/graft_stress_edges.parquet"
    StressDedup.scaledCorpus(spark, baseDir, copies)
      .write.mode(SaveMode.Overwrite).parquet("/tmp/graft_stress_docs.parquet")
    val docs = spark.read.parquet("/tmp/graft_stress_docs.parquet")
    Dedup.minhashLsh(docs, "doc_id", "text", tau)
      .write.mode(SaveMode.Overwrite).parquet(edgePath)
    val edges = spark.read.parquet(edgePath)
    val nEdges = edges.count()

    val (nNodes, tDeg) =
      time(Graph.degrees(edges, "id_a", "id_b").count())

    val (nComponents, tComp) = time {
      val comp = Dedup.components(edges, "id_a", "id_b")
      val c = comp.select("component").distinct().count()
      Dedup.release(comp)
      c
    }

    val (_, tPrFixed) = time {
      val pr = Graph.pagerank(edges, "id_a", "id_b", iters = iters)
      pr.count()
      Dedup.release(pr)
    }

    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val ((tolRounds, massErr), tPrTol) = time {
      val pr = Graph.pagerank(edges, "id_a", "id_b", iters = 4 * iters,
        tol = 1e-9, onRound = Some((i, d) => deltas += ((i, d))))
      val mass = pr.agg(org.apache.spark.sql.functions.sum("pagerank"))
        .head().getDouble(0)
      Dedup.release(pr)
      (deltas.size, math.abs(mass - 1.0))
    }

    val deltasJson = deltas
      .map { case (i, d) => s"""{"round":$i,"max_delta":$d}""" }
      .mkString("[", ",", "]")
    println(
      s"""{"stress":"graph","base":"$baseDir","copies":$copies,""" +
        s""""tau":$tau,"n_edges":$nEdges,""" +
        s""""degrees":{"nodes":$nNodes,"sec":$tDeg},""" +
        s""""components":{"components":$nComponents,"sec":$tComp},""" +
        s""""pagerank_fixed":{"iters":$iters,"sec":$tPrFixed},""" +
        s""""pagerank_tol":{"rounds":$tolRounds,"mass_err":$massErr,""" +
        s""""sec":$tPrTol,"deltas":$deltasJson}}""")
    spark.stop()
  }
}
