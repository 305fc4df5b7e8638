package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data invariants several oracle pairs silently depend on. Spark's
  * CAST(double AS BIGINT) truncates toward zero while DuckDB's rounds —
  * identical only because the columns cast this way hold integral
  * values. If the generator ever emits fractional quantities, this
  * fails loudly instead of the gate failing mysteriously. */
class InvariantsSpec extends SparkSpec {

  test("l_quantity is integral (truncate-vs-round cast parity precondition)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val bad = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") =!= floor(col("l_quantity")))
        .count()
      assert(bad == 0L, s"$dir has $bad fractional l_quantity rows")
    }
  }

  test("events.value and json k are within exact-double integer range") {
    val ev = Tables.events(spark, sfDir)
    val badK = ev
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(abs(col("k")) > (1L << 53)).count()
    assert(badK == 0L)
    val badV = ev.filter(abs(col("value")) > (1L << 53).toDouble).count()
    assert(badV == 0L)
  }

  test("every registered query carries a DuckDB oracle (no rows-only drift)") {
    // the board has been N/N hash-gated since round 15; a QueryDef
    // added with oracle = None would silently downgrade its driver
    // check to rows-only — pin full coverage structurally
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracles: ${(q -- o).toSeq.sorted}; " +
      s"orphan oracles: ${(o -- q).toSeq.sorted}")
    assert(q.size >= 190, s"query surface shrank: ${q.size}")
  }
}
