package graft

import org.apache.spark.sql.functions._

/** One-off diagnosis harness for the q38 round-over-round regression
  * (BENCHTABLE r7→r8: 0.172 → 0.262 s with no q38-path code change;
  * round-8 verdict finding #1). Breaks the query into its phases and
  * times each across repetitions, after the same warm/setup pass the
  * bench runs: `sbt "runMain graft.Q38Probe"`. */
object Q38Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.operators.Dedup.warmSharedState(spark, dir)
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val tbl = graft.sources.Layout.tableName(dir, "pairgraph")
    (1 to 4).foreach { i =>
      println(s"rep $i")
      System.gc()
      val pairs = spark.table(tbl).select(col("doc_a"), col("doc_b"))
      val edges = t("limit-probe collect")(
        pairs.as[(Long, Long)].limit(5000001).collect())
      t("full q38")(graft.operators.Dedup.dupClusters(spark, dir).count())
      t("count only")(pairs.count())
      println(s"  edges=${edges.length}")
    }
    spark.stop()
  }
}
