package graft

/** Ad-hoc timing harness for plan-shape experiments:
  * `sbt "runMain graft.Scratch <queryName> [sfDir]"` runs one contract
  * query twice (cold + warm) and prints both wall times — the warm
  * number is what plan-shape work should optimize (see SURVEY.md §8
  * round-3 notes for the shapes this caught: array-carrying window
  * sorts, giant unrolled trees, Generate-inlined projections). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_delay_avg")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (run <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[scratch] $name $run rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
