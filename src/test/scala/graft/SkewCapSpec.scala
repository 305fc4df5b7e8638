package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** The two operator-level skew hazards of the dedup family (SURVEY §9):
  * an LSH band bucket with m members generates m² candidate pairs
  * (q21), and a shingle with document frequency m generates m² join
  * rows (q23). Both now carry a cap; these specs exercise the firing
  * path with planted pathological input — the regime the sf testdata
  * (bucket/df ≪ cap) cannot reach — and pin the no-op contract on
  * normal data.
  */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 100

  /** 150 hot docs sharing heavy overlap + one normal near-dup pair
    * (901, 902 — identical text, so MinHash signatures are equal and
    * n-gram Jaccard is exactly 1 regardless of hash luck). */
  private def hotDocs(hotText: Long => String): DataFrame =
    ((1L to 150L).map(i => (i, hotText(i))) ++ Seq(
      (901L, "alpha beta gamma delta epsilon zeta"),
      (902L, "alpha beta gamma delta epsilon zeta"),
    )).toDF("doc_id", "text")

  test("q21 hot-bucket cap drops the pathological bucket, keeps normal pairs") {
    // identical text -> identical signature -> one bucket of 150 per band
    val docs = hotDocs(_ => "same boilerplate text repeated everywhere always")
    val capped = Dedup.minhashLshFrom(docs, Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((901L, 902L)),
      s"capped run must keep only the normal pair, got ${capped.size} pairs")
    // uncapped control: the hot bucket really is quadratic (150·149/2)
    val uncapped = Dedup.minhashLshFrom(docs, Int.MaxValue).count()
    assert(uncapped == 150L * 149 / 2 + 1)
  }

  test("q21 cap is a no-op when no bucket exceeds it") {
    val docs = hotDocs(_ => "x").filter($"doc_id" >= 900) // just the pair
    val a = Dedup.minhashLshFrom(docs, Cap).collect().toSeq
    val b = Dedup.minhashLshFrom(docs, Int.MaxValue).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q22 simhash hot-bucket cap drops the pathological bucket, keeps normal pairs") {
    // identical text -> identical 60-bit fingerprint -> one bucket of
    // 150 per band (and Hamming 0 pairs uncapped)
    val docs = hotDocs(_ => "same boilerplate text repeated everywhere always")
    val capped = Dedup.simhashFrom(docs, Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((901L, 902L)),
      s"capped run must keep only the normal pair, got ${capped.size} pairs")
    val uncapped = Dedup.simhashFrom(docs, Int.MaxValue).count()
    assert(uncapped == 150L * 149 / 2 + 1)
  }

  test("q23 df-cap removes hot-shingle fan-out, keeps normal pairs") {
    // each hot doc: shingles {common-shared-token (df 150),
    // shared-token-extra (df 150), token-extra-tail_i (df 1)} ->
    // uncapped pairwise jaccard 2/4 = 0.5 (emitted); capped, the two
    // hot shingles leave the universe -> zero intersection -> no pair
    val docs = hotDocs(i => s"common shared token extra tail$i")
    val capped = Dedup.ngramJaccardFrom(docs, Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((901L, 902L)),
      s"capped run must keep only the normal pair, got ${capped.size} pairs")
    val uncapped = Dedup.ngramJaccardFrom(docs, Int.MaxValue).count()
    assert(uncapped == 150L * 149 / 2 + 1)
  }

  test("q23 cap is a no-op when no shingle df exceeds it") {
    val docs = hotDocs(_ => "x").filter($"doc_id" >= 900)
    val a = Dedup.ngramJaccardFrom(docs, Cap).collect().toSeq
    val b = Dedup.ngramJaccardFrom(docs, Int.MaxValue).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q78 window df-cap removes boilerplate fan-out, keeps normal pairs") {
    // hot docs: common 20-token prefix (window df=150) + unique tail
    // (second window df=1). Uncapped: every hot pair shares 1 of 2
    // windows -> containment 0.5 -> quadratic pair set. Capped: the
    // boilerplate window leaves the universe consistently (sizes too),
    // so hot docs have no shared windows; the normal identical pair
    // (one window each) stays at containment 1.
    val common = (1 to 20).map(i => s"c$i").mkString(" ")
    val pairTxt = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = ((1L to 150L).map(i => (i, s"$common tail$i")) ++ Seq(
      (901L, pairTxt), (902L, pairTxt))).toDF("doc_id", "text")
    val capped = Dedup.spanOverlapFrom(docs, Cap)
    // observed metrics live on the executed QueryExecution — act on
    // `capped` itself, not a derived projection
    val rows = capped.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((901L, 902L)),
      s"capped run must keep only the normal pair, got ${got.size} pairs")
    val m = capped.queryExecution.observedMetrics("graft.cap(window_df)")
    assert(m.getAs[Long]("hot_windows") == 1L && m.getAs[Long]("dropped_rows") == 150L,
      m.toString)
    val uncapped = Dedup.spanOverlapFrom(docs, Int.MaxValue).count()
    assert(uncapped == 150L * 149 / 2 + 1)
  }

  test("q102 index-side window df-cap drops boilerplate fan-out, keeps the real admission") {
    // corpus: 150 docs sharing a boilerplate 20-token prefix (that
    // window's index df = 150) + one doc of unique pair text. Batch:
    // one doc that IS the boilerplate span (1 window, the hot one) and
    // one that IS the pair text. Uncapped, the boilerplate batch doc
    // "matches" all 150 corpus docs at containment 1.0 — pure fan-out;
    // capped, the hot window leaves the INDEX (batch side untouched,
    // so containment denominators are unaffected) and only the genuine
    // admission remains, observably.
    val common = (1 to 20).map(i => s"c$i").mkString(" ")
    val pairTxt = (1 to 20).map(i => s"p$i").mkString(" ")
    val corpus = ((1L to 150L).map(i => (i, s"$common tail$i")) :+ ((700L, pairTxt)))
      .toDF("doc_id", "text")
    val batch = Seq((901L, common), (902L, pairTxt)).toDF("doc_id", "text")
    val capped = Dedup.spanIncrementalFrom(batch, corpus, Cap)
    val rows = capped.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((902L, 700L)),
      s"capped run must keep only the genuine admission, got ${rows.length} pairs")
    val m = capped.queryExecution.observedMetrics("graft.cap(winindex_df)")
    assert(m.getAs[Long]("hot_buckets") == 1L && m.getAs[Long]("dropped_rows") == 150L,
      m.toString)
    val uncapped = Dedup.spanIncrementalFrom(batch, corpus, Int.MaxValue).count()
    assert(uncapped == 151L) // 150 boilerplate hits + the genuine one
  }

  // ---- cap observability: dropping is lossy for genuine over-cap
  // near-dup clusters, so it must never be silent. The CollectMetrics
  // node records (hot buckets, dropped rows) on every execution.

  test("q21 bucket-cap firing is observable: hot bucket/row counts recorded") {
    val docs = hotDocs(_ => "same boilerplate text repeated everywhere always")
    val df = Dedup.minhashLshFrom(docs, Cap)
    df.collect()
    val m = df.queryExecution.observedMetrics("graft.cap(band,bval)")
    // identical hot text -> one 150-member bucket in each of 4 bands
    assert(m.getAs[Long]("hot_buckets") == 4L, m.toString)
    assert(m.getAs[Long]("dropped_rows") == 600L, m.toString)
  }

  test("q21 bucket-cap no-op records zero drops") {
    val docs = hotDocs(_ => "x").filter($"doc_id" >= 900)
    val df = Dedup.minhashLshFrom(docs, Cap)
    df.collect()
    // AQE's empty-relation propagation may prune the (empty) metrics
    // node out of the final plan entirely — absence IS the zero signal;
    // if the node survived, its counters must both read zero
    val m = df.queryExecution.observedMetrics.get("graft.cap(band,bval)")
    assert(m.forall(r =>
      r.getAs[Long]("hot_buckets") == 0L && r.getAs[Long]("dropped_rows") == 0L),
      m.toString)
  }

  test("q23 df-cap firing is observable: hot shingle/row counts recorded") {
    // the two shared shingles each hit df=150; the pair docs' shingles
    // stay at df=2
    val docs = hotDocs(i => s"common shared token extra tail$i")
    val df = Dedup.ngramJaccardFrom(docs, Cap)
    df.collect()
    val m = df.queryExecution.observedMetrics("graft.cap(shingle_df)")
    assert(m.getAs[Long]("hot_shingles") == 2L, m.toString)
    assert(m.getAs[Long]("dropped_rows") == 300L, m.toString)
  }

  test("q88 containment df-cap fires on the same hazard (shared shingle table), observable") {
    // same quadratic-join hazard as q23 — q88 reads the identically
    // capped shingle table under its own metrics name
    val docs = hotDocs(i => s"common shared token extra tail$i")
    val df = Dedup.containmentFrom(docs, Cap)
    val rows = df.collect()
    // with the two hot shingles dropped, hot docs share nothing; the
    // identical normal pair keeps containment 1.0
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
      == Set((901L, 902L, 1.0)))
    val m = df.queryExecution.observedMetrics("graft.cap(containment_df)")
    assert(m.getAs[Long]("hot_shingles") == 2L, m.toString)
    assert(m.getAs[Long]("dropped_rows") == 300L, m.toString)
  }
}
