package graft

import graft.operators.Relational

/** The raw HLL estimates behind q14 are engine-specific, so q14's
  * DRIVER gate hashes only the decision surface (exact twins + bound
  * verdicts). This spec keeps the raw estimates themselves honest:
  * every estimate must land within ±5% of q13's exact distinct counts
  * (the sketch is configured at rsd = 0.01, so 5% is a hard error,
  * not noise) — the same rule q14 compiles into its verdict column. */
class SketchBoundSpec extends SparkSpec {
  import spark.implicits._

  test("q14 HLL estimates within ±5% of q13 exact distinct counts") {
    val exact = Relational.distinctStats(spark, sfDir)
      .select("l_returnflag", "n_part", "n_ord")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Relational.approxDistinctRaw(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (flag, aPart, aOrd) =>
      val (ePart, eOrd) = exact(flag)
      def within(a: Long, e: Long): Boolean =
        math.abs(a - e) <= math.max(1L, math.round(e * 0.05))
      assert(within(aPart, ePart), s"$flag approx_part $aPart vs exact $ePart")
      assert(within(aOrd, eOrd), s"$flag approx_ord $aOrd vs exact $eOrd")
    }
    // and q14's own gated verdict surface agrees with the rule
    val verdicts = Relational.approxDistinct(spark, sfDir)
      .select("part_bound", "ord_bound").as[(String, String)].collect()
    assert(verdicts.forall(v => v._1 == "within_5pct" && v._2 == "within_5pct"),
      s"q14 verdict surface disagrees with the bound: ${verdicts.mkString(", ")}")
  }
}
