package graft

import graft.operators.TextAnalysis

/** q73's funnel counts must be monotone by construction (each stage is
  * an AND of the previous), and the keep rate the implied ratio. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("filterFunnel stages are monotone and keep_rate consistent") {
    val rows = TextAnalysis.filterFunnel(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, l, lq, k, rate) =>
      assert(n >= l && l >= lq && lq >= k && k >= 0, s"non-monotone funnel for $src")
      assert(rate == k.toDouble / n.toDouble)
    }
    // the funnel must actually discriminate on this data: some docs
    // pass all gates (n_kept > 0), some fail at least one
    assert(rows.map(_._5).sum > 0)
    assert(rows.map(r => r._2 - r._5).sum > 0)
  }
}
