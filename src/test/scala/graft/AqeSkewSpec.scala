package graft

import org.apache.spark.sql.functions._

/** SURVEY §9 claims AQE's skew-join handles relational-join skew
  * without manual salting. Prove the mechanism fires: a join with one
  * pathologically hot key, skew thresholds tuned down to testdata
  * size, must show `isSkewJoin=true` in its final adaptive plan and
  * still produce the plain-join result. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition and preserves the join result") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // testdata-sized thresholds: a partition is "skewed" beyond ~64KB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from coalescing everything into one partition first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key with 200k rows, 50 cold keys with 10 each
      val left = spark.range(0, 200000).select(lit(42L).as("k"), col("id"))
        .union(spark.range(0, 500).select((col("id") % 50 + 100).as("k"), col("id")))
      val right = (Seq(42L) ++ (100L until 150L)).toDF("k")
        .withColumn("tag", concat(lit("t"), col("k")))
      val joined = left.join(right, Seq("k"))
      // collect() on THIS DataFrame so its own queryExecution carries
      // the final adaptive plan (count() would execute a separate one)
      val total = joined.collect().length
      assert(total == 200000 + 500)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"AQE skew handling did not fire:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
