package graft

import graft.operators.Pipeline

/** Throwaway executed-plan probe: run one registered query to
  * completion and print its post-AQE node counts (file scans,
  * shuffles, reused exchanges) — the exchange-reuse evidence the
  * optimization round's plan claims rest on.
  * `sbt "runMain graft.PlanCountProbe q78_span_overlap [sfDir]"` */
object PlanCountProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q78_span_overlap")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val flat = Pipeline.flattenExecutedPlan(df.queryExecution.executedPlan)
    val scans = flat.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    val shuffles = flat.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    val reusedEx = flat.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
    val mapParts = flat.count(_.getClass.getSimpleName.startsWith("MapPartitions"))
    println(s"[plancount] $name scans=$scans shuffles=$shuffles reused=$reusedEx mapPartitions=$mapParts")
    spark.stop()
  }
}
