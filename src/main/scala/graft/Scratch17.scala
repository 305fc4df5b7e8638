package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

// temporary round-17 iteration harness — deleted before close
object Scratch17 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.builder("8").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.sources.Layout
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val u = conv(substring(md5(concat(lit("spj:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val path = "/tmp/spj_shards"
    Layout.deleteWarehouseDir(s, path)
    d.withColumn("u", u).withColumn("shard_id", shiftright(col("u"), 29))
      .repartition(8, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("u"), col("doc_id"))
      .write.format("graft.sources.ShardSource")
      .option("path", path).mode("overwrite").save()
    def src = s.read.format("graft.sources.ShardSource").option("path", path).load()
    // per-shard aggregates from two INDEPENDENT reads, joined on shard_id
    val a = src.groupBy(col("shard_id")).agg(sum(abs(col("n_chars"))).as("mass"))
    val b = src.groupBy(col("shard_id")).agg(sum(hash(col("text")).cast("long")).as("h"))
    val j = a.join(b, Seq("shard_id"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println(p)
    println("== exchanges: " + "Exchange hashpartitioning".r.findAllIn(p).size)
    // row-level join (no aggregate) on shard_id + doc_id? shard-keyed only:
    val jr = src.as("x").join(src.as("y"), Seq("shard_id", "doc_id"))
    println("== row join count " + jr.count())
    val pr = jr.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println("== row-join exchanges: " + "Exchange hashpartitioning".r.findAllIn(pr).size)
    println(pr.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    s.stop()
  }
}
