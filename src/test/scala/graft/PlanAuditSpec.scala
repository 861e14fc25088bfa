package graft

/** Regression guards for the physical-plan properties PLANS.md
  * documents — the plans are part of the product's scale contract, so
  * a refactor that silently loses a pushdown or broadcasts an
  * unbounded side should fail CI, not wait for the next manual audit. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  private def count(p: String, re: String): Int = re.r.findAllIn(p).size

  test("q02 pushes filters to the parquet reader (0 shuffles, 1 scan)") {
    val p = plan("q02_filter_project")
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(count(p, "FileScan parquet") == 1, p)
    assert(p.contains("PushedFilters: ["), p)
    assert("PushedFilters: \\[\\]".r.findFirstIn(p).isEmpty,
      "pushdown list is empty:\n" + p)
  }

  test("dimension joins broadcast the small side (q03, q04)") {
    assert(count(plan("q03_join_agg"), "BroadcastExchange") >= 1)
    // 4 dims broadcast, only the agg shuffles
    val p4 = plan("q04_multi_join")
    assert(count(p4, "BroadcastExchange") >= 4, p4)
    assert(count(p4, "Exchange hashpartitioning") == 1, p4)
  }

  test("windowed top-k gets WindowGroupLimit pushdown (q06)") {
    val p = plan("q06_window_rank")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("sessionize shuffles exactly once on the key (q12)") {
    val p = plan("q12_sessionize")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("semi/anti joins stay joins, not row-by-row filters (q07, q08)") {
    assert(plan("q07_semi_join").contains("LeftSemi"))
    assert(plan("q08_anti_join").contains("LeftAnti"))
  }

  test("range join never plans a nested loop (q21)") {
    val p = plan("q21_range_join")
    assert(!p.contains("NestedLoop"), p)
  }

  test("dedup candidate generation has no cartesian/nested-loop stage") {
    Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
          s"$q:\n$p")
      }
  }

  test("narrow text operators read one scan with zero shuffles") {
    Seq("text_stats", "text_quality_score", "text_lang_id",
      "text_fingerprint", "sample_bernoulli").foreach { q =>
      val p = plan(q)
      assert(count(p, "Exchange hashpartitioning") == 0, s"$q:\n$p")
      assert(count(p, "FileScan parquet") == 1, s"$q:\n$p")
    }
  }

  test("exact profiling plans no Expand (the multi-distinct trap)") {
    val p = plan("dq_profile")
    assert(!p.contains("Expand"), p)
  }
}
