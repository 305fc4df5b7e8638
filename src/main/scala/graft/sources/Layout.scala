package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB layout PRODUCER — the pipeline stage that writes the
  * physical layouts every scale claim in SURVEY §9 depends on, exposed
  * as a product component (not test machinery):
  *
  *  - [[bucketedLineitemOrders]]: lineitem + orders written as
  *    catalog tables bucketed (and sorted) by order key. Every
  *    downstream orderkey equi-join then plans as a SortMergeJoin with
  *    ZERO ShuffleExchange — the shuffle is
  *    paid once at write time and amortized over every consumer. At
  *    100 TB this is the difference between re-shuffling 100 TB per
  *    join and never shuffling it again (proven in `LayoutWriterSpec`;
  *    q79 is the driver-gated consumer).
  *  - [[partitionedEvents]]: the events fact written
  *    partitioned-by-day, so time-ranged scans prune partitions at
  *    planning time (`LayoutSpec` pins ~1/30th file reads for a
  *    one-day filter).
  *
  * Writes are idempotent per (session, dir): a ConcurrentHashMap gate
  * makes the first caller write and every later caller re-read — the
  * in-session stand-in for "run once per corpus snapshot". Bucket
  * count is 8 at test scale; at 100 TB it would be sized so one
  * bucket ≈ one executor-core's worth of data (e.g. 4096), which is a
  * config change, not a plan change. Table names carry a dir tag so
  * different scale factors never collide in the shared warehouse.
  */
object Layout {
  val Buckets = 8

  private def tag(dir: String): String =
    java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)

  private val ensured = new ConcurrentHashMap[(SparkSession, String, String), String]()

  private def once(s: SparkSession, dir: String, what: String)(write: => Unit): Unit =
    ensured.computeIfAbsent((s, dir, what), { _ => write; "done" })

  /** Clear a managed table AND its leftover warehouse location before
    * (re)writing. The warehouse outlives the in-memory catalog: a
    * fresh session doesn't know the table but its files still sit at
    * the managed location, and saveAsTable refuses to create over
    * them (LOCATION_ALREADY_EXISTS) — so snapshot refresh means
    * catalog drop + physical delete, exactly what a production
    * overwrite-per-snapshot job does. */
  private def refresh(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/$table")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Bucketed-by-orderkey lineitem + orders, written once per
    * (session, dir), re-read from the catalog. sortBy additionally
    * lets a SortMergeJoin skip its per-query sorts when each bucket
    * is read as a single file (true once the writer is fed one task
    * per bucket; not guaranteed at test parallelism, so specs pin
    * only the exchange elimination). */
  def bucketedLineitemOrders(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = s"graft_lineitem_bkt_${tag(dir)}"
    val ord = s"graft_orders_bkt_${tag(dir)}"
    once(s, dir, "bucketed") {
      refresh(s, li)
      refresh(s, ord)
      Tables.lineitem(s, dir).write
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(li)
      Tables.orders(s, dir).write
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(ord)
    }
    (s.table(li), s.table(ord))
  }

  /** Events written date-partitioned (one directory per day) and
    * re-read — the layout that turns a day filter into partition
    * pruning instead of a full scan. */
  def partitionedEvents(s: SparkSession, dir: String): DataFrame = {
    val base = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/graft_events_by_day_${tag(dir)}"
    once(s, dir, "events_parted") {
      Tables.events(s, dir).withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(path)
    }
    s.read.parquet(path)
  }
}
