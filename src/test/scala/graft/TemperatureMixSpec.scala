package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline

/** q161 — the temperature-scaled multilingual mix: α = 1/2 weights,
  * integer targets, hash-threshold realized sample. Runs at sf0.01
  * where the language distribution is skewed enough for the
  * flattening property to be visible (en ≈ 44% of the corpus). */
class TemperatureMixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val out: Array[Row] =
    Pipeline.temperatureMix(spark, dir).collect()

  test("weights are round(1e6 * sqrt(n)) of the raw per-language counts") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val n = counts(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == math.round(1e6 * math.sqrt(n.toDouble)))
    }
  }

  test("temperature flattens the mix: head language down, tail language up") {
    val byN = out.sortBy(_.getLong(1))
    val head = byN.last // largest language
    val tail = byN.head // smallest language
    assert(head.getLong(7) < head.getLong(6),
      s"head language share must shrink: $head")
    assert(tail.getLong(7) > tail.getLong(6),
      s"tail language share must grow: $tail")
  }

  test("the realized sample tracks its target and stays within the corpus") {
    out.foreach { r =>
      val (n, target, sampled) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(sampled <= n)
      assert(sampled > 0, s"degenerate sample for ${r.getString(0)}")
      // hash thresholding is binomial around the target: allow a wide
      // deterministic band (±50% + 10) — a rate bug lands far outside
      assert(math.abs(sampled - target) <= target / 2 + 10,
        s"sampled $sampled vs target $target for ${r.getString(0)}")
    }
  }

  test("the mix is deterministic: a re-run reproduces every row") {
    val again = Pipeline.temperatureMix(spark, dir).collect()
    assert(out.toSeq == again.toSeq)
  }
}
