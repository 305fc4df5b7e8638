package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Design probe for the corpus-trained BPE's vocabulary-size dial
  * (round-11 third wave): the gated q118/q109 surface trains
  * [[Pipeline.BpeRounds]] = 6 rules (sized to keep the unrolled SQL
  * oracle tractable); this measures what a LARGER learned vocabulary
  * buys — tokens-per-word compression at rounds ∈ {6, 16, 32, 64}
  * over both oracle scales, Spark-side only (the mechanism is the
  * same loop run longer; production ~50k-round vocabularies change
  * the rule count, not the plan). One JSON line per (sf, rounds):
  * `sbt "runMain graft.BpeProbe"`. Results recorded in BASELINE.md. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = graft.sources.Tables.documents(spark, dir)
      val base = docs.select(
          size(graft.functions.Fns.tokens(col("text"))).cast("long").as("nw"),
          length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("nc"))
        .agg(sum(col("nw")), sum(col("nc"))).head()
      val (words, chars) = (base.getLong(0), base.getLong(1))
      for (rounds <- Seq(6, 16, 32, 64)) {
        val t0 = System.nanoTime()
        val merges = Pipeline.bpeTrainedMergesN(spark, dir, rounds)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val tok = Pipeline.bpeTokenizerOf(merges)
        val bpe = docs.select(size(tok(col("text"))).cast("long").as("nb"))
          .agg(sum(col("nb"))).head().getLong(0)
        println(f"""{"probe":"bpe_rounds","sf":"$sf","rounds":$rounds,"words":$words,"chars":$chars,"bpe_tokens":$bpe,"bpe_per_ws":${bpe.toDouble / words}%.3f,"chars_per_bpe":${chars.toDouble / bpe}%.3f,"train_sec":${math.rint(trainSec * 100) / 100}}""")
      }
      // ---- VOCABULARY-ECONOMY row (round-12, q124's scale claim):
      // the encode cost driver is the DISTINCT-WORD vocabulary, not
      // the corpus — measure both counts plus the q124-shaped
      // distinct-word encode wall at the production 64-rule table.
      // Across the 10× corpus step the word count grows ~10× while
      // distinct words grow sublinearly (natural-text vocabulary
      // growth), which is exactly the q124 plan's leverage.
      val distinctWords = docs
        .select(explode(graft.functions.Fns.tokens(col("text"))).as("w"))
        .select(col("w")).distinct().count()
      val merges64 = Pipeline.bpeTrainedMergesN(spark, dir, 64)
      val t1 = System.nanoTime()
      val dw = docs.select(explode(graft.functions.Fns.tokens(col("text"))).as("w"))
        .select(col("w")).distinct()
      val encoded = dw.select(
          size(Pipeline.bpeWordTokens(merges64)(col("w"))).cast("long").as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      val encodeSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"bpe_vocab_economy","sf":"$sf","corpus_words":$words,"distinct_words":$distinctWords,"vocab_frac":${distinctWords.toDouble / words}%.4f,"distinct_encode_tokens":$encoded,"encode_sec":${math.rint(encodeSec * 100) / 100}}""")
    }
    spark.stop()
  }
}
