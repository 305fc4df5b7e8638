package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-13: the CONCURRENT-WRITER claim driven with real threads.
  * Every store event allocates its generation and commits inside one
  * per-store critical section (`ctr.synchronized` — allocation + write
  * + marker + view swap), so racing writers must land DISTINCT,
  * strictly monotone generations and the final view must contain every
  * event's effect regardless of interleaving. The scaladocs have
  * claimed this since round 11 (`AtomicPublishSpec` covers racing
  * READERS); this spec races the WRITERS themselves — mixed appends,
  * upserts and evolving upserts from a thread pool — and checks the
  * fold. (Single-writer remains the production deployment shape; the
  * critical section is what makes a misconfigured double-writer safe
  * rather than corrupting.) */
class MvccConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("racing writers: distinct monotone generations, every event's effect in the view") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    val base = (0L until 20L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val seed = (100L until 110L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    Layout.appendRewrite(spark, dir, "conc", bkt, seed)(base) // gens 1, 2
    val name = Layout.tableName(dir, "concupd")

    // 8 concurrent events: 4 disjoint-key appends, 2 upserts replacing
    // disjoint live keys, 2 evolving upserts carrying a new column.
    // Effects are key-disjoint so the expected final state is
    // interleaving-independent; what the race tests is the COMMIT
    // machinery (generation allocation, sidecar appends, view swaps).
    val jobs: Seq[() => Unit] = Seq(
      () => { Layout.appendSegment(spark, dir, "conc", bkt,
        (200L until 205L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")); () },
      () => { Layout.appendSegment(spark, dir, "conc", bkt,
        (210L until 215L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")); () },
      () => { Layout.appendSegment(spark, dir, "conc", bkt,
        (220L until 225L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")); () },
      () => { Layout.appendSegment(spark, dir, "conc", bkt,
        (230L until 235L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")); () },
      () => { Layout.upsertSegment(spark, dir, "conc", bkt,
        Seq((3L, 77L), (4L, 77L)).toDF("vec_id", "cent_id"), Seq("vec_id")); () },
      () => { Layout.upsertSegment(spark, dir, "conc", bkt,
        Seq((7L, 88L), (8L, 88L)).toDF("vec_id", "cent_id"), Seq("vec_id")); () },
      () => { Layout.upsertSegment(spark, dir, "conc", bkt,
        Seq((103L, 99L, 1L)).toDF("vec_id", "cent_id", "w1"),
        Seq("vec_id"), evolve = true); () },
      () => { Layout.upsertSegment(spark, dir, "conc", bkt,
        Seq((105L, 99L, 2L)).toDF("vec_id", "cent_id", "w2"),
        Seq("vec_id"), evolve = true); () })

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = jobs.map(j => pool.submit(new Runnable {
        def run(): Unit = j()
      }))
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()

    // generations 3..10 all landed, no duplicates, views committed
    val vs = Layout.readableVersions(spark, dir, "concupd")
    assert(vs == (1L to 10L), s"generation sequence broken: $vs")

    // the fold: base with 3/4/7/8 replaced, seed with 103/105 replaced
    // (carrying the evolved columns), plus the four appended ranges
    val view = spark.table(name)
    assert(view.columns.toSet == Set("vec_id", "cent_id", "w1", "w2"))
    val got = view.select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    val expect =
      (0L until 20L).map(k => k -> (if (k == 3 || k == 4) 77L
        else if (k == 7 || k == 8) 88L else k % 8)).toMap ++
      (100L until 110L).map(k => k -> (if (k == 103 || k == 105) 99L
        else k % 8)).toMap ++
      (Seq(200L until 205L, 210L until 215L, 220L until 225L,
        230L until 235L).flatten.map(k => k -> (k % 8))).toMap
    assert(got == expect,
      s"view diverged: missing=${expect.toSet -- got.toSet} extra=${got.toSet -- expect.toSet}")
    // evolved columns: exactly the evolving upserts' rows carry values
    assert(view.filter(col("w1").isNotNull).select("vec_id").as[Long]
      .collect().toSeq == Seq(103L))
    assert(view.filter(col("w2").isNotNull).select("vec_id").as[Long]
      .collect().toSeq == Seq(105L))
  }
}
