package graft

import graft.operators.TextAnalysis

/** q87 bigram-LM scoring: hand-checked model math and partition
  * invariance (the integer micro-probability quantization exists
  * precisely so scores cannot depend on partitioning or engine). */
class TextModelSpec extends SparkSpec {
  import spark.implicits._

  test("q87 bigram LM reproduces the hand-computed MLE on a two-doc corpus") {
    // d0 = "a b a b": bigrams (a,b)x2, (b,a)x1; d1 = "a b c": (a,b), (b,c)
    // model: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2
    // micro(a,b) = (1e6*3) div 3 = 1000000; micro(b,a) = micro(b,c) = 500000
    // d0: (2*1000000 + 500000) div 3 = 833333; d1: 1500000 div 2 = 750000
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmFrom(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 833333L), (1L, 2L, 750000L)))
  }

  test("q87 scores are partition-invariant (exact integer model)") {
    val base = TextAnalysis.bigramLm(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(base.nonEmpty)
    // every document with >= 2 tokens is scored exactly once
    assert(base.map(_._1).distinct.length == base.length)
    val docs1 = graft.sources.Tables.documents(spark, sfDir).repartition(1)
    val docs7 = graft.sources.Tables.documents(spark, sfDir).repartition(7)
    assert(TextAnalysis.bigramLmFrom(docs1)
      .as[(Long, Long, Long)].collect().toSeq == base)
    assert(TextAnalysis.bigramLmFrom(docs7)
      .as[(Long, Long, Long)].collect().toSeq == base)
  }

  test("q87 a doc of corpus-unique bigrams scores the floor, repeated boilerplate the ceiling") {
    // boilerplate docs share one dominant bigram chain; the unique doc's
    // bigrams occur once each, with shared PREFIXES diluting c1 — its
    // conditional probabilities, and so its score, sit strictly below
    val boiler = (1 to 50).map(_ => "the quick fox").mkString(" ")
    val docs = ((0L to 9L).map(i => (i, boiler)) :+ (99L, "the slow dog jumped"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmFrom(docs)
      .as[(Long, Long, Long)].collect()
    val boilerScores = got.filter(_._1 <= 9L).map(_._3).toSet
    val unique = got.filter(_._1 == 99L).map(_._3).head
    assert(boilerScores.size == 1, "identical docs must score identically")
    assert(unique < boilerScores.head,
      s"unique-bigram doc ($unique) must score below boilerplate (${boilerScores.head})")
  }
}
