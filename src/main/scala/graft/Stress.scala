package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale-stress harness for the dedup/clustering path (not part of the
  * driver contract): replicates the sf0.1 `documents` table `copies`×
  * (10 ≈ sf1) with a controlled duplicate structure, then times the
  * three production dedup stages and reports per-round label-propagation
  * counts. The claims this checks are the scale-dependent ones —
  * band-bucket caps hold, the candidate join does not explode, and
  * min-label propagation converges in O(component diameter) rounds —
  * which small-SF correctness runs cannot exercise.
  *
  * Duplicate structure, by base-doc parity:
  *  - even doc_id → CLIQUE: every copy appends one copy-tagged token, so
  *    all `copies` variants stay pairwise-similar (diameter 1; the
  *    common case: one document syndicated many times).
  *  - odd doc_id → CHAIN: copy i rewrites the first 4·i words with
  *    position-tagged tokens shared by later copies, so similarity
  *    decays with copy distance and only nearby copies pair up
  *    (diameter ~copies/2; the adversarial case for propagation rounds).
  *
  * Usage: runMain graft.StressDedup [baseDir] [copies] [tau]
  */
object StressDedup {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def scaledCorpus(spark: SparkSession, baseDir: String,
      copies: Int): DataFrame = {
    val base = Tables(spark, baseDir, "documents").select("doc_id", "text")
    (0 until copies).map { i =>
      val chain = array_join(
        transform(split(col("text"), " "),
          (w, p) => when(p < lit(i * 4), concat(lit("rp"), p)).otherwise(w)),
        " ")
      base.select(
        (col("doc_id") * copies + i).as("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(s" v$i")))
          .otherwise(chain).as("text"))
    }.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val tau = if (args.length > 2) args(2).toDouble else 0.6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize once so every stage reads real parquet, like the bench
    val corpusPath = "/tmp/graft_stress_docs.parquet"
    scaledCorpus(spark, baseDir, copies)
      .write.mode(SaveMode.Overwrite).parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val nDocs = docs.count()

    val (nPairs, tPairs) =
      time(Dedup.minhashLsh(docs, "doc_id", "text", tau).count())

    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val ((nNodes, nComponents), tComp) = time {
      val comp = Dedup.components(
        Dedup.minhashLsh(docs, "doc_id", "text", tau), "id_a", "id_b",
        onRound = Some((i, changed) => rounds += ((i, changed))))
      val n = comp.count()
      val c = comp.select("component").distinct().count()
      Dedup.release(comp)
      (n, c)
    }

    val (nSurvivors, tDrop) =
      time(Dedup.dropNearDuplicates(docs, "doc_id", "text", tau).count())

    val roundsJson = rounds
      .map { case (i, n) => s"""{"round":$i,"changed":$n}""" }
      .mkString("[", ",", "]")
    println(
      s"""{"stress":"dedup","base":"$baseDir","copies":$copies,"tau":$tau,""" +
        s""""n_docs":$nDocs,"pairs":{"n":$nPairs,"sec":$tPairs},""" +
        s""""components":{"nodes":$nNodes,"components":$nComponents,""" +
        s""""sec":$tComp,"rounds":$roundsJson},""" +
        s""""dropdups":{"survivors":$nSurvivors,"sec":$tDrop}}""")
    spark.stop()
  }
}
