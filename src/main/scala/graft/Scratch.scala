package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    var t0 = System.nanoTime()
    val pairs = Dedup.minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst").cache()
    println(f"[s] edges count ${edges.count()} ${(System.nanoTime()-t0)/1e9}%.2f s")
    var labels = edges.select(col("src").as("doc")).distinct().withColumn("lab", col("doc")).cache()
    var changed = 1L; var rounds = 0
    while (changed > 0 && rounds < 20) {
      t0 = System.nanoTime()
      val nbrMin = edges.join(labels, edges("src") === labels("doc"))
        .groupBy(col("dst").as("doc2")).agg(min(col("lab")).as("nlab"))
      val next = labels.join(nbrMin, labels("doc") === col("doc2"), "left")
        .select(col("doc"), least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab")).cache()
      changed = next.join(labels.withColumnRenamed("lab", "old"), "doc")
        .filter(col("lab") =!= col("old")).count()
      labels.unpersist(); labels = next; rounds += 1
      println(f"[s] round $rounds changed=$changed ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
