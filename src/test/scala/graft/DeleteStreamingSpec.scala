package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Layout
import graft.streaming.DocIngest

/** Round-9 item 7: the DELETE lifecycle (q106's batch verb) composed
  * with the STREAMING front doors. After a takedown rewrites the
  * standing indexes ([[Layout.deleteRewrite]] — versioned publish), a
  * stream restarted from its checkpoint must:
  *
  *  1. NOT resurrect deleted-document state: admission decisions come
  *     from the POST-delete index the restarted query resolves, never
  *     from replay state recorded while the document still existed —
  *     a re-submission of a deleted document's text is ADMITTED again
  *     (exact door) / scores zero coverage (span door) / fires no
  *     pair (near-dup door);
  *  2. keep every pre-existing exactly-once guarantee: pre-crash
  *     ADMITTED documents' replays stay suppressed by the recovered
  *     state store.
  *
  * The exact door's operator ordering is load-bearing here (anti join
  * BEFORE replay-dedup, see [[DocIngest.dedupedIngest]]): the state
  * store holds only admitted documents, so a delete can never be
  * vetoed by stale stream state. */
class DeleteStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("exact door: post-delete restart re-admits the deleted text; admitted replays stay suppressed") {
    val dir = tmp("graft_del_exact_")
    val corpusAll = Seq((100L, "kept document"), (200L, "takedown target"))
      .toDF("doc_id", "text")
    // the standing corpus artifact, then its takedown rewrite of
    // doc 200 through the real delete verb (versioned atomic publish)
    val survivors = Layout.deleteRewrite(spark, dir, "delstream_corpus", None,
      Seq(200L).toDF("doc_id"), Seq("doc_id"))(corpusAll)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def start(corpus: org.apache.spark.sql.DataFrame) =
      DocIngest.dedupedIngest(mem.toDF().toDF("doc_id", "text"), corpus)
        .writeStream.format("parquet")
        .option("path", s"$dir/admitted")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    def admitted() = spark.read.parquet(s"$dir/admitted")
      .select("doc_id", "text").as[(Long, String)].collect().toSet

    // run 1, PRE-delete corpus: the target's text is rejected (corpus
    // holds it), alpha is admitted. Then KILL.
    val q1 = start(corpusAll)
    try {
      mem.addData((1L, "takedown target"), (2L, "alpha"))
      q1.processAllAvailable()
      assert(admitted() == Set((2L, "alpha")))
    } finally q1.stop()

    // while down: a NEW crawl re-submits the deleted text, plus a
    // replay of the pre-crash admission
    mem.addData((3L, "takedown target"), (4L, "alpha"))

    // run 2 from the SAME checkpoint, static side = the post-delete
    // snapshot (what a production restart resolves through the
    // published view)
    val q2 = start(survivors)
    try {
      q2.processAllAvailable()
      // (3, takedown target): decided by the POST-delete index —
      // admitted. A stale state entry from the pre-delete rejection
      // would wrongly suppress it (the ordering bug this spec pins).
      // (4, alpha): suppressed by the RECOVERED admitted-state.
      assert(admitted() == Set((2L, "alpha"), (3L, "takedown target")),
        s"post-delete admission wrong: ${admitted()}")
    } finally q2.stop()
  }

  test("span door: restarted stream scores a deleted doc's text against the post-delete window index") {
    val dir = tmp("graft_del_span_")
    val span = (1 to 25).map(i => s"w$i").mkString(" ")
    val other = (1 to 25).map(i => s"k$i").mkString(" ")
    val corpusAll = Seq((90L, span), (91L, other)).toDF("doc_id", "text")
    val winAll = Dedup.windowTable(corpusAll)
    // takedown of doc 90: its windows leave the index via the delete
    // verb, keyed by doc_id — the q104/q106 maintenance shape
    val winSurvivors = Layout.deleteRewrite(spark, dir, "delstream_win", None,
      Seq(90L).toDF("doc_id"), Seq("doc_id"))(winAll)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def start(known: org.apache.spark.sql.DataFrame) =
      DocIngest.spanIngest(mem.toDF().toDF("doc_id", "text"), known)
        .writeStream.format("parquet")
        .option("path", s"$dir/scored")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    def scored() = spark.read.parquet(s"$dir/scored")
      .select("doc_id", "coverage").as[(Long, Double)].collect().toMap

    // run 1, PRE-delete index: a copy of doc 90's text scores full
    // coverage. KILL.
    val q1 = start(winAll)
    try {
      mem.addData((501L, span))
      q1.processAllAvailable()
      assert(scored() == Map(501L -> 1.0))
    } finally q1.stop()

    // while down: a NEW doc re-submits the deleted text, plus a replay
    // of the already-scored doc
    mem.addData((502L, span), (501L, span))

    // run 2 from the same checkpoint against the POST-delete index
    val q2 = start(winSurvivors)
    try {
      q2.processAllAvailable()
      // 502 is scored by the post-delete index: doc 90's windows are
      // gone, so coverage is 0.0 — the deleted document no longer
      // claims ownership of its spans. 501's replay emits nothing
      // (recovered GroupState).
      assert(scored() == Map(501L -> 1.0, 502L -> 0.0),
        s"post-delete span scoring wrong: ${scored()}")
    } finally q2.stop()
  }

  test("near-dup door: restarted stream fires no pair against a deleted corpus doc") {
    val dir = tmp("graft_del_lsh_")
    def txt(i: Int) = s"unique document number $i with tokens t$i u$i v$i w$i"
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpusAll = ((1L to 30L).map(i => (i, txt(i.toInt))) :+ ((99L, shared)))
      .toDF("doc_id", "text")
    // BOTH runs read WRITTEN band-index artifacts (the production
    // shape): a mixed in-memory/table static side would flip column
    // nullability between restarts and trip the state-store key
    // schema check
    val bandsAll = Layout.publishVersioned(spark, dir, "delstream_bands_pre",
      None)(Dedup.bandTable(corpusAll))
    val bandsSurvivors = Layout.deleteRewrite(spark, dir, "delstream_bands", None,
      Seq(99L).toDF("doc_id"), Seq("doc_id"))(bandsAll)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def start(bands: org.apache.spark.sql.DataFrame) =
      DocIngest.nearDupIngest(mem.toDF().toDF("doc_id", "text"), bands)
        .writeStream.format("parquet")
        .option("path", s"$dir/hits")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    def hits() = spark.read.parquet(s"$dir/hits")
      .select("doc_new", "doc_corpus").as[(Long, Long)].collect().toSeq.sorted

    // run 1, PRE-delete: the near-copy fires against corpus doc 99. KILL.
    val q1 = start(bandsAll)
    try {
      mem.addData((101L, shared))
      q1.processAllAvailable()
      assert(hits() == Seq((101L, 99L)))
    } finally q1.stop()

    // while down: another near-copy arrives after doc 99's takedown
    mem.addData((102L, shared))

    // run 2 against the post-delete band index: no phantom pair with
    // the deleted doc — the index rewrite, not stream state, decides
    val q2 = start(bandsSurvivors)
    try {
      q2.processAllAvailable()
      assert(hits() == Seq((101L, 99L)), s"phantom pair: ${hits()}")
    } finally q2.stop()
  }
}
