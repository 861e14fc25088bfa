package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-time family scale stress (round-10, PLANS.md): the whole
  * windowing/sessionize/as-of family was analysis-broken for one
  * round (the events-timestamp encoding change); now that it is
  * restored, stress it at 10× sf0.1 (1M events) WITH planted skew and
  * planted exactness, through the REAL driver bindings (the stress
  * table is written as TIMESTAMP(MICROS) parquet and read through
  * `Tables.events`' dtype branch — the same path production takes).
  *
  *  - 10 shifted copies of the sf0.1 events (distinct user spaces) —
  *    scale-out without skew;
  *  - ONE hot user with 50k events at exactly 10-minute gaps → must
  *    sessionize to EXACTLY ONE 50k-event session (the straggler
  *    probe: one user = one window partition);
  *  - one staccato user with 2,000 events at 31-minute gaps (just
  *    over the 30-min threshold) → EXACTLY 2,000 single-event
  *    sessions (the boundary probe).
  *
  * Run: runMain graft.StressEvents
  */
object StressEvents {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-events] $what%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = Tables(spark, sfDir, "events")
    val nBase = base.count()

    // 10 shifted copies: user spaces disjoint, event ids disjoint.
    // ts normalized through Tables.tsCol so the union with the
    // timestamp-built planted rows is encoding-agnostic (a nanos-long
    // base would otherwise fail analysis against TimestampType)
    val copies = (0 until 10).map { i =>
      base.select(
        (col("event_id") + lit(i * 10000000L)).as("event_id"),
        Tables.tsCol(base).as("ts"),
        (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)

    val t0us = 1577836800000000L // 2020-01-01T00:00:00Z in micros
    val hot = spark.range(50000).select(
      (col("id") + 900000000L).as("event_id"),
      timestamp_micros(lit(t0us) + col("id") * (600L * 1000000L)).as("ts"),
      lit(777000001L).as("user_id"),
      lit("hot").as("event_type"), lit(1.0).as("value"),
      lit("{}").as("props"))
    val staccato = spark.range(2000).select(
      (col("id") + 910000000L).as("event_id"),
      timestamp_micros(lit(t0us) + col("id") * (1860L * 1000000L)).as("ts"),
      lit(777000002L).as("user_id"),
      lit("staccato").as("event_type"), lit(1.0).as("value"),
      lit("{}").as("props"))

    val dir = java.nio.file.Files.createTempDirectory("evstress").toString
    timed(s"write 10x events (+52k planted) as micros parquet") {
      copies.unionByName(hot).unionByName(staccato)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val n = Tables.events(spark, dir).count()
    require(n == nBase * 10 + 52000, s"staged $n")

    // the real driver bindings against the stress dir
    val sessions = timed("q12_sessionize on 1.05M events") {
      val df = SparkEntry.queries("q12_sessionize")(spark, dir)
      df.cache().count()
      df
    }
    val hotSess = sessions.filter(col("user_id") === 777000001L)
      .select(col("sess_seq"), col("n_events")).as[(Long, Long)].collect()
    require(hotSess.length == 1 && hotSess.head._2 == 50000L,
      s"hot user must be ONE 50k session, got ${hotSess.length} sessions")
    val stacN = sessions.filter(col("user_id") === 777000002L).count()
    require(stacN == 2000L,
      s"staccato user must be 2000 single-event sessions, got $stacN")
    val nSessBase = sessions.filter(col("user_id") < 777000000L).count()
    println(s"[stress-events] sessions: base=$nSessBase hot=1 staccato=2000")
    sessions.unpersist()

    timed("q11_event_windows on 1.05M events") {
      SparkEntry.queries("q11_event_windows")(spark, dir).count()
    }
    timed("q31_twa on 1.05M events") {
      SparkEntry.queries("q31_twa")(spark, dir).count()
    }
    timed("dq_freshness on 1.05M events") {
      SparkEntry.queries("dq_freshness")(spark, dir).count()
    }
    spark.stop()
  }
}
