package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

// temporary round-17 iteration harness — deleted before close
object Scratch17 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.builder("8").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.sources.{Layout, ShardSource}
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val u = conv(substring(md5(concat(lit("scr17:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val path = "/tmp/scr17_shards"
    Layout.deleteWarehouseDir(s, path)
    val sharded = d.withColumn("u", u)
      .withColumn("shard_id", shiftright(col("u"), 29))
      .repartition(8, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("u"), col("doc_id"))
    // 1. connector write (overwrite)
    sharded.write.format("graft.sources.ShardSource")
      .option("path", path).mode("overwrite").save()
    println("== wrote; listing:")
    Layout.listWarehouseNames(s, path).foreach(println)
    println("== manifest:")
    print(new String(Layout.headBytes(s, s"$path/_shard_manifest.json", 4000), "UTF-8"))
    // 2. read back through connector
    def src = s.read.format("graft.sources.ShardSource").option("path", path).load()
    println("== schema: " + src.schema.toDDL)
    println("== count: " + src.count() + " vs raw " + d.count())
    // 3. key-grouped: groupBy shard_id should have zero hash exchange
    val agg = src.groupBy(col("shard_id")).agg(count(lit(1)).as("n"),
      sum(col("n_chars")).as("sc"))
    // force data path by grouping on data column too? no — this is the stats path.
    agg.collect().sortBy(_.getLong(0)).foreach(println)
    println("== agg plan (stats path expected):")
    println(agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    // 4. data-path grouped agg (disable stats by adding a data col)
    val agg2 = src.groupBy(col("shard_id"))
      .agg(sum(hash(col("text")).cast("long")).as("h"))
    agg2.collect()
    val p2 = agg2.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println("== data-path grouped agg plan:")
    println(p2)
    println("== zero hash exchange: " + !p2.contains("Exchange hashpartitioning"))
    // 5. append (delta)
    val delta = d.filter(pmod(col("doc_id"), lit(10)) === 3)
      .withColumn("u", u).withColumn("shard_id", shiftright(col("u"), 29))
      .repartition(8, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("u"), col("doc_id"))
    delta.write.format("graft.sources.ShardSource")
      .option("path", path).mode("append").save()
    println("== after append, count: " + src.count() + " expected " +
      (d.count() + delta.count()))
    println("== manifest after append:")
    print(new String(Layout.headBytes(s, s"$path/_shard_manifest.json", 4000), "UTF-8"))
    // 6. stats pushdown observables
    val f0 = ShardSource.openedFiles.get(); val m0 = ShardSource.manifestReads.get()
    val st = src.groupBy(col("shard_id")).agg(count(lit(1)).as("n")).collect()
    println(s"== stats read: openedDelta=${ShardSource.openedFiles.get() - f0} " +
      s"manifestDelta=${ShardSource.manifestReads.get() - m0} rows=${st.length}")
    // 7. stale the manifest, verify refusal -> data path
    val (fs, mp) = Layout.hfs(s, s"$path/_shard_manifest.json")
    val out = fs.create(mp, true)
    out.write(("{\"format\":2,\"schema\":\"doc_id BIGINT,text STRING,lang STRING,n_chars BIGINT,u BIGINT,shard_id BIGINT\"}\n" +
      "{\"shard_id\":0,\"rows\":1,\"sum_chars\":1,\"min_doc\":1,\"max_doc\":1,\"files\":[{\"name\":\"shard_id=0/part-zz\",\"len\":1}]}\n").getBytes("UTF-8"))
    out.close()
    val f1 = ShardSource.openedFiles.get(); val r0 = ShardSource.statsRefused.get()
    val n2 = src.groupBy(col("shard_id")).agg(count(lit(1)).as("n")).collect().map(_.getLong(1)).sum
    println(s"== stale manifest: openedDelta=${ShardSource.openedFiles.get() - f1} " +
      s"refusedDelta=${ShardSource.statsRefused.get() - r0} total=$n2")
    s.stop()
  }
}
