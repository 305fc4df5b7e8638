package graft

import graft.operators.Relational

/** q14 (HLL approx distinct) carries no DuckDB oracle — sketch
  * estimates are engine-specific — so the driver records a rows-only
  * check. This spec upgrades it to verified-by-bound: every estimate
  * must land within ±5% of q13's exact distinct counts (the sketch is
  * configured at rsd = 0.01, so 5% is a hard error, not noise). */
class SketchBoundSpec extends SparkSpec {
  import spark.implicits._

  test("q14 HLL estimates within ±5% of q13 exact distinct counts") {
    val exact = Relational.distinctStats(spark, sfDir)
      .select("l_returnflag", "n_part", "n_ord")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Relational.approxDistinct(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (flag, aPart, aOrd) =>
      val (ePart, eOrd) = exact(flag)
      def within(a: Long, e: Long): Boolean =
        math.abs(a - e) <= math.max(1L, math.round(e * 0.05))
      assert(within(aPart, ePart), s"$flag approx_part $aPart vs exact $ePart")
      assert(within(aOrd, eOrd), s"$flag approx_ord $aOrd vs exact $eOrd")
    }
  }
}
