package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sources.{Layout, ShardManifest}

/** Round-19 micro-bench: what the per-file ZONE MAPS are worth on a
  * delta-heavy layout. Builds the q181 shape at probe scale — four
  * era commits with disjoint doc_id ranges, one file per (shard, era)
  * — then times a POINT LOOKUP (`shard_id = h AND doc_id = v`) two
  * ways:
  *
  *   A. zone maps ON (the manifest as written — the scan opens ONE
  *      file);
  *   B. zone maps STRIPPED (the pre-round-19 manifest shape — the
  *      scan opens every file of the shard);
  *
  * plus an id-range census (`doc_id > c3`) both ways (era image vs
  * every file). The wall-clock gap scales with the append history a
  * fold hasn't collapsed yet — at a production layout with dozens of
  * deltas per shard the B side reads the whole history per lookup.
  *
  * Usage: `sbt "runMain graft.FileSkipProbe /root/testdata/sf0.1"`;
  * prints median walls over 5 runs + the opened-file counts. */
object FileSkipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("32").appName("file-skip-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val u = conv(substring(md5(concat(lit("fsp:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val mx = d.agg(max(col("doc_id"))).collect()(0).getLong(0)
    def build(name: String): String = {
      val p = Layout.warehousePath(spark, Layout.tableName(dir, name))
      Layout.deleteWarehouseDir(spark, p)
      val cuts = Seq(0L, mx / 4, mx / 2, 3 * mx / 4, mx + 1)
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        d.filter(col("doc_id") > lo && col("doc_id") <= hi)
          .withColumn("u", u)
          .withColumn("shard_id", shiftright(col("u"), 29))
          .repartition(8, col("shard_id"))
          .sortWithinPartitions(col("shard_id"), col("u"), col("doc_id"))
          .write.format("graft.sources.ShardSource")
          .option("path", p).mode(if (i == 0) "overwrite" else "append").save()
      }
      p
    }
    val hconf = spark.sessionState.newHadoopConf()
    val pOn = build("fsponshards")
    val pOff = build("fspoffshards")
    // strip the OFF layout's zone maps (shard bounds too) — the
    // pre-round-19 manifest shape
    val (sch, entries) = ShardManifest.read(hconf, pOff).get
    ShardManifest.write(hconf, pOff, sch.get, entries.map(e =>
      e.copy(minDoc = None, maxDoc = None,
        files = e.files.map(_.copy(minDoc = None, maxDoc = None)))))
    val probe = d.filter(col("doc_id") > mx / 2)
      .agg(min(col("doc_id"))).collect()(0).getLong(0)
    val probeShard = d.filter(col("doc_id") === probe)
      .select(shiftright(u, 29)).collect()(0).getLong(0)
    def src(p: String) = spark.read
      .format("graft.sources.ShardSource").option("path", p).load()
    def pointWall(p: String): Double = {
      val t0 = System.nanoTime()
      src(p).filter(col("shard_id") === probeShard && col("doc_id") === probe)
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    def rangeWall(p: String): Double = {
      val t0 = System.nanoTime()
      src(p).filter(col("doc_id") > 3 * mx / 4)
        .agg(count(lit(1)), sum(col("n_chars"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def opened(f: => Unit): Long = {
      val f0 = graft.sources.ShardSource.openedFiles.get()
      f
      graft.sources.ShardSource.openedFiles.get() - f0
    }
    // warm both plans, then INTERLEAVE the timed runs — an A-then-B
    // order would hand B the JIT/codegen warmth A paid for
    Seq(pOn, pOff).foreach { p => pointWall(p); rangeWall(p) }
    val walls = (1 to 7).map { _ =>
      (pointWall(pOn), pointWall(pOff), rangeWall(pOn), rangeWall(pOff))
    }
    def medOf(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val po = opened(src(pOn).filter(col("shard_id") === probeShard &&
      col("doc_id") === probe).collect())
    val pf = opened(src(pOff).filter(col("shard_id") === probeShard &&
      col("doc_id") === probe).collect())
    val ro = opened(src(pOn).filter(col("doc_id") > 3 * mx / 4)
      .agg(count(lit(1))).collect())
    val rf = opened(src(pOff).filter(col("doc_id") > 3 * mx / 4)
      .agg(count(lit(1))).collect())
    println(f"[zone maps ON ] point: ${medOf(walls.map(_._1))}%.4f s " +
      f"($po files); range: ${medOf(walls.map(_._3))}%.4f s ($ro files)")
    println(f"[zone maps OFF] point: ${medOf(walls.map(_._2))}%.4f s " +
      f"($pf files); range: ${medOf(walls.map(_._4))}%.4f s ($rf files)")
    spark.stop()
  }
}
