package graft
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Fns._
import graft.operators.Dedup
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[s] $name n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, dir)
    time("docs")(docs.count())

    val toks = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    time("tokens")(toks.select(col("doc_id"), size(col("w")).as("n")).agg(sum("n")).count())

    val sgl = toks.select(col("doc_id"), explode(array_distinct(shingles(col("w"), 3))).as("sgl"))
    time("shingles")(sgl.count())
    time("shingles2")(sgl.count())

    val hs = sgl.select(col("doc_id"), hash32(col("sgl")).as("h"))
    time("md5")(hs.count())
    time("md52")(hs.count())

    val minCols = (0 until 16).map(i =>
      min(pmod(col("h") * (2 * i + 1) + lit(912367L) * i, lit(2147483647L))).as(s"m$i"))
    val sigs = hs.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("sigs")(sigs.count())
    time("sigs2")(sigs.count())

    time("q21-full")(Dedup.minhashLsh(spark, dir).count())
    time("q21-full2")(Dedup.minhashLsh(spark, dir).count())
    time("q22-full")(Dedup.simhash(spark, dir).count())
    time("q22-full2")(Dedup.simhash(spark, dir).count())
    time("q23-full")(Dedup.ngramJaccard(spark, dir).count())
    time("q23-full2")(Dedup.ngramJaccard(spark, dir).count())
    time("q38-full")(Dedup.dupClusters(spark, dir).count())
    spark.stop()
  }
}
