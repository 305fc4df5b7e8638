package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Empirical scaling probe for the q07-shape fact⋈fact join+aggregate:
  * replicates lineitem k× (k = 1, 2, 4, 8 → up to 4.8M joined rows at
  * sf0.1) and times the join, printing one JSON line per k. Near-linear
  * wall growth demonstrates the plan holds under scale-up: the shuffle
  * is the only super-constant cost, and AQE re-sizes it per k.
  *
  * `sbt "runMain graft.ScaleProbe [sfDir]"` — results also validate
  * exactness under replication (each aggregate must be exactly k× the
  * base, the property StressSpec pins at k=4).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    def q(k: Int) = (1 to k).map(_ => li).reduce(_ union _)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("rev"))
    q(1).count() // warm: JIT + codegen + parquet footer cache
    val base = q(1).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 2, 4, 8).foreach { k =>
      val t0 = System.nanoTime()
      val rows = q(k).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val exact = rows.forall(r => r.getLong(1) == k * base(r.getString(0)))
      println(f"""{"k":$k,"sec":$sec%.3f,"rows_joined":${rows.map(_.getLong(1)).sum},"exact_kx":$exact}""")
    }
    spark.stop()
  }
}
