package graft

/** Dev tool: EXECUTED-plan statistics for a query (AQE-final, unlike
  * [[Explain]]'s static plan — static plans show subtree duplication
  * that runtime stage reuse eliminates; `DataFrame.explain` cannot show
  * ReusedExchange under AQE). Usage:
  * `sbt "runMain graft.ExecPlan q23_ngram_jaccard [sfDir]"`. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println("ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(p).length)
    println("TableCacheQueryStage: " + "TableCache".r.findAllIn(p).length)
    println("Exchange nodes: " + "Exchange (hash|range|Single)".r.findAllIn(p).length)
    println("MapPartitions nodes: " + "MapPartitions".r.findAllIn(p).length)
    println("Scan parquet nodes: " + "Scan parquet".r.findAllIn(p).length)
    spark.stop()
  }
}
