package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Round-11 item 3: the BPE merge table is TRAINED from the corpus
  * (k rounds of most-frequent-adjacent-pair over the hash-ordered
  * sample) instead of a constant. Training == its SQL re-derivation
  * is the q118 driver gate; this spec pins the training loop's own
  * invariants: rule count and the a ≠ b contract (what makes the
  * greedy pass equal the oracle's simultaneous merge), memoized
  * determinism, the iterative dependency (later rounds may merge
  * earlier rounds' outputs), and that the learned tokenizer actually
  * compresses (fewer tokens than characters). */
class BpeTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("trained merges: full rounds, a != b, deterministic across calls") {
    val m1 = Pipeline.bpeTrainedMerges(spark, dir)
    assert(m1.size == Pipeline.BpeRounds)
    assert(m1.forall { case (a, b) => a != b },
      "a rule with a == b breaks the simultaneous-merge oracle equality")
    assert(m1.distinct.size == m1.size, "duplicate merge rule learned")
    val m2 = Pipeline.bpeTrainedMerges(spark, dir)
    assert(m2 == m1, "training is not deterministic/memoized")
  }

  test("q118 table mirrors the learned rules in priority order") {
    val rows = Pipeline.bpeTrainTable(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    val merges = Pipeline.bpeTrainedMerges(spark, dir)
    assert(rows.map(_._1).toSeq == (1 to Pipeline.BpeRounds))
    assert(rows.map(t => (t._2, t._3)).toSeq == merges)
    assert(rows.forall(t => t._4 == t._2 + t._3))
  }

  test("the learned tokenizer compresses: per-doc BPE tokens strictly between words and chars") {
    val docs = graft.sources.Tables.documents(spark, dir).limit(200)
    val merges = Pipeline.bpeTrainedMerges(spark, dir)
    val tok = Pipeline.bpeTokenizerOf(merges)
    val agg = docs
      .select(
        size(graft.functions.Fns.tokens(col("text"))).cast("long").as("nw"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("nc"),
        size(tok(col("text"))).cast("long").as("nb"))
      .agg(sum(col("nw")).as("words"), sum(col("nc")).as("chars"),
        sum(col("nb")).as("bpe"))
      .head()
    val (words, chars, bpe) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    // BPE over characters merges SOME pairs (bpe < chars) but cannot
    // go below one token per word (bpe >= words)
    assert(bpe < chars, s"learned merges never fired: bpe=$bpe chars=$chars")
    assert(bpe >= words, s"BPE produced fewer tokens than words: $bpe < $words")
  }
}
