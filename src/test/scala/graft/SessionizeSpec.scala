package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize

/** Stateful-streaming sessionization vs the batch twin: with all events
  * in one trigger, the streaming path must emit exactly the CLOSED
  * sessions (every batch session except each user's last, which stays
  * open in GroupState); a second trigger's gap then closes more. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000 // one minute in µs

  test("flatMapGroupsWithState emits closed sessions; open stays in state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = Sessionize.sessionsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two sessions (gap 40 min between), second still open;
      // user 2: one open session.
      mem.addData(
        (1L, 0 * M), (1L, 10 * M), (1L, 20 * M),
        (1L, 60 * M), (1L, 65 * M),
        (2L, 5 * M))
      q.processAllAvailable()
      val t1 = spark.table("sessions")
        .as[Sessionize.Session].collect().toSet
      assert(t1 == Set(Sessionize.Session(1L, 3L, 0L, 20 * M)))

      // a much later event for user 1 closes (60,65); user 2 extends.
      mem.addData((1L, 200 * M), (2L, 15 * M))
      q.processAllAvailable()
      val t2 = spark.table("sessions").as[Sessionize.Session].collect().toSet
      assert(t2 == Set(
        Sessionize.Session(1L, 3L, 0L, 20 * M),
        Sessionize.Session(1L, 2L, 60 * M, 65 * M)))
    } finally q.stop()
  }

  test("late in-gap event from a later trigger merges without moving the session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = Sessionize.sessionsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      mem.addData((1L, 100 * M))
      q.processAllAvailable()
      // a LATE event 10 min earlier (within the 30-min gap) arrives in
      // the next trigger, then a far-future event closes the session:
      // it must close as [90, 100] with 2 events — never end < start
      mem.addData((1L, 90 * M))
      q.processAllAvailable()
      mem.addData((1L, 500 * M))
      q.processAllAvailable()
      val got = spark.table("sessions_ooo").as[Sessionize.Session].collect().toSet
      assert(got == Set(Sessionize.Session(1L, 2L, 90 * M, 100 * M)))
    } finally q.stop()
  }

  test("batch sessionization is deterministic and gap-consistent") {
    val got = Sessionize.sessionsBatch(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // session ids are 1..k contiguous per user; durations non-negative
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    assert(got.forall(_._4 >= 0))
  }
}
