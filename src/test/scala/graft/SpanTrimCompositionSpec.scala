package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-8 span-family composition proofs (q101 → q99 as q105):
  *
  *  - the surgical trim is a FIXPOINT: a second trim pass over the
  *    trimmed corpus changes nothing (no removable window survives
  *    pass one, and the token splices pass one creates do not conjure
  *    cross-document duplicates on either the real corpus or the
  *    planted fixture);
  *  - the composition collapses duplication: post-trim, q99's tagger
  *    finds ZERO cross-document duplicated windows — shared material
  *    survives exactly once, in its canonical (min-id) owner, whose
  *    text is untouched.
  */
class SpanTrimCompositionSpec extends SparkSpec {
  import spark.implicits._

  private def trimmedMap(docs: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Dedup.trimmedDocsFrom(docs).as[(Long, String)].collect().toMap

  test("span trim is a fixpoint on the real corpus: second pass is a no-op") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val once = trimmedMap(docs)
    val twice = trimmedMap(once.toSeq.toDF("doc_id", "text"))
    assert(once.nonEmpty)
    // a doc trimmed to "" has no tokens, so the second pass emits no
    // row for it — absent means (vacuously) unchanged-empty
    val moved = once.keySet.filter(k => twice.getOrElse(k, "") != once(k))
    assert(moved.isEmpty, s"second trim changed ${moved.size} docs, e.g. ${moved.take(3)}")
    assert(twice.keySet.subsetOf(once.keySet), "second pass conjured docs")
  }

  test("q105 composition on the real corpus: post-trim dup_windows are zero everywhere") {
    val rows = Dedup.trimFractionFrom(graft.sources.Tables.documents(spark, sfDir))
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_._3 > 0), "fixture corpus has no pre-trim duplication to remove")
    rows.foreach { case (id, nwB, _, _, nwA, dupA) =>
      assert(dupA == 0L, s"doc $id still carries $dupA duplicated windows post-trim")
      assert(nwA <= nwB, s"doc $id grew windows post-trim")
    }
  }

  test("planted shared span: canonical copy intact, every other occurrence cut, fixpoint holds") {
    // a 25-token span shared verbatim by docs 1 and 2 (span length >
    // WindowLen = 20 so it yields 6 duplicated window positions), a
    // disjoint doc 3 as control
    val span = (1 to 25).map(i => s"shared$i").mkString(" ")
    val d1 = s"alpha begin $span alpha end"
    val d2 = (1 to 22).map(i => s"two$i").mkString(" ") + s" $span " +
      (1 to 22).map(i => s"tail$i").mkString(" ")
    val d3 = (1 to 60).map(i => s"ctrl$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")

    val trimmed = trimmedMap(docs)
    // canonical (min-id) owner keeps its text verbatim
    assert(trimmed(1L) == d1, "canonical doc was modified")
    // the non-canonical copy lost the span (and only span-covered
    // tokens): no shared token survives, every unique token does
    val t2 = trimmed(2L).split(" ").filter(_.nonEmpty).toSet
    assert(t2.forall(!_.startsWith("shared")), s"shared tokens survived in doc 2: $t2")
    assert((1 to 22).forall(i => t2.contains(s"two$i") && t2.contains(s"tail$i")),
      "trim cut tokens outside the planted span")
    assert(trimmed(3L) == d3, "disjoint doc was modified")

    // composition: pre-trim duplication on 1 and 2, zero after
    val rows = Dedup.trimFractionFrom(docs)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._3 == 6L && rows(2L)._3 == 6L,
      s"planted span should yield 6 dup windows per doc: $rows")
    assert(rows(3L)._3 == 0L)
    assert(rows.values.forall(_._6 == 0L), s"post-trim duplication survived: $rows")

    // fixpoint on the fixture too
    assert(trimmedMap(trimmed.toSeq.toDF("doc_id", "text")) == trimmed)
  }
}
