package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Exactness under scale-up: replicating the fact table k× must scale
  * every exact aggregate by exactly k — no float drift, no
  * partial-agg-order effects — because all internal accumulation is
  * integer/decimal. This is the local stand-in for "the same query on
  * 100 TB returns the same (scaled) numbers", run on 2.4M joined rows. */
class StressSpec extends SparkSpec {
  import spark.implicits._

  test("fact x4 replication scales join aggregates exactly (decimal, no drift)") {
    val dir = "/root/testdata/sf0.1"
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    def agg(fact: org.apache.spark.sql.DataFrame) =
      fact.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
    val base = agg(li)
      .select(col("o_orderpriority"), col("n"), col("rev"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rep = agg((1 to 4).map(_ => li).reduce(_ union _))
      .select(col("o_orderpriority"), col("n"), col("rev"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rep.keySet == base.keySet)
    base.foreach { case (k, (n, rev)) =>
      assert(rep(k)._1 == 4 * n, s"$k count drifted")
      assert(rep(k)._2.compareTo(rev.multiply(new java.math.BigDecimal(4))) == 0,
        s"$k revenue drifted: base=$rev rep=${rep(k)._2}")
    }
  }
}
