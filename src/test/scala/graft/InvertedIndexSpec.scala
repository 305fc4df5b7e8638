package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** q158 — the inverted index + conjunctive retrieval, checked against
  * a pure-Scala reference retrieval over the raw rows (tokenize →
  * tf/df → ranked query set → conjunctive integer scores → top-1). */
class InvertedIndexSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    TextAnalysis.invertedIndex(spark, sfDir).collect()

  private lazy val reference: Map[Long, (String, String, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val tf: Map[(String, Long), Long] = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (w, id))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val df: Map[String, Long] =
      tf.keys.groupBy(_._1).map { case (t, v) => t -> v.size.toLong }
    val ranked = df.toSeq.sortBy { case (t, d) => (-d, t) }.map(_._1)
    assert(ranked.length >= 20)
    (0 until 8).map { i =>
      val (a, b) = (ranked(4 + i), ranked(12 + i))
      val docsWithBoth = docs.map(_._1).filter(id =>
        tf.contains((a, id)) && tf.contains((b, id)))
      val scored = docsWithBoth.map { id =>
        val sc = tf((a, id)) * (n / df(a)) + tf((b, id)) * (n / df(b))
        (id, sc)
      }
      if (scored.isEmpty) i.toLong -> ((a, b, 0L, -1L, 0L))
      else {
        val top = scored.minBy { case (id, sc) => (-sc, id) }
        i.toLong -> ((a, b, scored.length.toLong, top._1, top._2))
      }
    }.toMap
  }

  test("every query's hit count, top-1 doc and score match the reference") {
    val got = out.filter(_.getLong(0) != 99L).map { r =>
      r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == reference)
  }

  test("retrieval is non-degenerate: some query has hits and a real score") {
    val data = out.filter(_.getLong(0) != 99L)
    assert(data.exists(_.getLong(3) > 0L))
    assert(data.filter(_.getLong(3) > 0L).forall(_.getLong(5) > 0L))
  }

  test("point lookups prune the term-bucketed postings table") {
    val d = out.find(_.getLong(0) == 99L).get
    assert(d.getString(1) == "zz_decision_point_lookup_pruned")
    assert(d.getLong(3) == 1L,
      "a 2-term lookup must plan SelectedBucketsCount <= 2 of k")
  }
}
