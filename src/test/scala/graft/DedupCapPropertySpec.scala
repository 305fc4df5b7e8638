package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Property coverage for the round-5 operators' skew caps — q77's
  * index-side hot-bucket cap and q78's window df-cap — across RANDOM
  * boilerplate-heavy corpus shapes, extending `SkewCapSpec`'s fixed
  * pathological cases the way the q21/q23 caps are treated. Shapes are
  * drawn with scalacheck generators under a fixed seed (deterministic
  * replay); each shape plants (a) a boilerplate cluster bigger than
  * the cap and (b) normal near-dup pairs with disjoint vocabulary, and
  * asserts the cap drops exactly the boilerplate fan-out:
  *
  *  - capped run emits exactly the planted pairs;
  *  - uncapped control emits the full quadratic hot set, proving the
  *    generated cluster really was pathological;
  *  - the firing is observable with exact (hot, dropped) counters;
  *  - under-cap shapes are a no-op (capped == uncapped).
  */
class DedupCapPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 48

  private def draw[A](g: Gen[A], i: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(0xC0FFEEL + i))

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  /** Random corpus shape. Vocabularies are namespaced (h/p/t prefixes
    * + per-pair index) so hot docs, planted pairs, and unique tails can
    * never collide on a token, whatever the generator draws. */
  private case class Shape(mCorpus: Int, mBatch: Int, planted: Int,
                           hotWords: Seq[String], pairWords: Seq[Seq[String]]) {
    def hotText: String = hotWords.zipWithIndex.map { case (w, k) => s"h${k}_$w" }.mkString(" ")
    def pairText(j: Int): String =
      pairWords(j).zipWithIndex.map { case (w, k) => s"p${j}_${k}_$w" }.mkString(" ")
  }

  private def shapeGen(overCap: Boolean, pairLen: Int): Gen[Shape] = for {
    mCorpus <- if (overCap) Gen.chooseNum(Cap + 1, 160) else Gen.chooseNum(2, Cap - 1)
    mBatch <- Gen.chooseNum(1, 12)
    planted <- Gen.chooseNum(1, 3)
    hotLen <- Gen.chooseNum(4, 9)
    hot <- Gen.listOfN(hotLen, word)
    pairs <- Gen.listOfN(planted, Gen.listOfN(pairLen, word))
  } yield Shape(mCorpus, mBatch, planted, hot, pairs)

  // ---- q77: incremental LSH, index-side hot-bucket cap --------------

  /** (batch, corpus) frames: the hot text appears mBatch times in the
    * batch and mCorpus times in the corpus; planted pair j spans the
    * boundary (one batch doc, one corpus doc, identical unique text). */
  private def incrementalFrames(sh: Shape) = {
    val corpus = ((1L to sh.mCorpus.toLong).map(i => (i, sh.hotText)) ++
      (0 until sh.planted).map(j => (3001L + j, sh.pairText(j)))).toDF("doc_id", "text")
    val batch = ((1L to sh.mBatch.toLong).map(i => (1000L + i, sh.hotText)) ++
      (0 until sh.planted).map(j => (2001L + j, sh.pairText(j)))).toDF("doc_id", "text")
    (batch, corpus)
  }

  test("q77 property: index cap keeps exactly the planted cross-boundary pairs") {
    (0 until 5).foreach { i =>
      val sh = draw(shapeGen(overCap = true, pairLen = 6), i)
      val (batch, corpus) = incrementalFrames(sh)
      val capped = Dedup.incrementalLshFrom(batch, corpus, Cap)
      val rows = capped.collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until sh.planted).map(j => (2001L + j, 3001L + j)).toSet
      assert(got == want, s"shape $i ($sh): got ${got.size} pairs, want $want")
      // firing is observable: identical hot text -> all 4 bands hot
      val m = capped.queryExecution.observedMetrics("graft.cap(band,bval)")
      assert(m.getAs[Long]("hot_buckets") == 4L, s"shape $i: $m")
      assert(m.getAs[Long]("dropped_rows") == 4L * sh.mCorpus, s"shape $i: $m")
      // uncapped control: the full batch-hot x corpus-hot fan-out
      val uncapped = Dedup.incrementalLshFrom(batch, corpus, Int.MaxValue).count()
      assert(uncapped == sh.mBatch.toLong * sh.mCorpus + sh.planted,
        s"shape $i: uncapped=$uncapped")
    }
  }

  test("q77 property: cap is a no-op when every index bucket is under it") {
    (0 until 3).foreach { i =>
      val sh = draw(shapeGen(overCap = false, pairLen = 6), 100 + i)
      val (batch, corpus) = incrementalFrames(sh)
      val a = Dedup.incrementalLshFrom(batch, corpus, Cap).collect().toSeq
      val b = Dedup.incrementalLshFrom(batch, corpus, Int.MaxValue).collect().toSeq
      assert(a == b && a.nonEmpty, s"shape $i ($sh): capped/uncapped diverged")
    }
  }

  // ---- q78: span overlap, window df-cap -----------------------------

  /** Corpus: m hot docs = 20-token boilerplate prefix + unique tail
    * (2 windows each: shared df=m, tail df=1); planted pair j = two
    * docs with the same unique 20-token text (1 window, df=2). */
  private def spanDocs(sh: Shape) =
    ((1L to sh.mCorpus.toLong).map(i => (i, s"${sh.hotText} t$i")) ++
      (0 until sh.planted).flatMap(j =>
        Seq((9000L + 2 * j, sh.pairText(j)), (9001L + 2 * j, sh.pairText(j))))
      ).toDF("doc_id", "text")

  test("q78 property: window df-cap keeps exactly the planted pairs") {
    (0 until 5).foreach { i =>
      val sh0 = draw(shapeGen(overCap = true, pairLen = Dedup.WindowLen), 200 + i)
      // hot docs need a full 20-token boilerplate window + 1-token tail
      val sh = sh0.copy(hotWords = draw(
        Gen.listOfN(Dedup.WindowLen, word), 300 + i))
      val docs = spanDocs(sh)
      val capped = Dedup.spanOverlapFrom(docs, Cap)
      val rows = capped.collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until sh.planted).map(j => (9000L + 2 * j, 9001L + 2 * j)).toSet
      assert(got == want, s"shape $i ($sh): got ${got.size} pairs, want $want")
      val m = capped.queryExecution.observedMetrics("graft.cap(window_df)")
      assert(m.getAs[Long]("hot_windows") == 1L, s"shape $i: $m")
      assert(m.getAs[Long]("dropped_rows") == sh.mCorpus.toLong, s"shape $i: $m")
      val uncapped = Dedup.spanOverlapFrom(docs, Int.MaxValue).count()
      assert(uncapped == sh.mCorpus.toLong * (sh.mCorpus - 1) / 2 + sh.planted,
        s"shape $i: uncapped=$uncapped")
    }
  }

  test("q78 property: cap is a no-op when every window df is under it") {
    (0 until 3).foreach { i =>
      val sh0 = draw(shapeGen(overCap = false, pairLen = Dedup.WindowLen), 400 + i)
      val sh = sh0.copy(hotWords = draw(
        Gen.listOfN(Dedup.WindowLen, word), 500 + i))
      val docs = spanDocs(sh)
      val a = Dedup.spanOverlapFrom(docs, Cap).collect().toSeq
      val b = Dedup.spanOverlapFrom(docs, Int.MaxValue).collect().toSeq
      assert(a == b && a.nonEmpty, s"shape $i ($sh): capped/uncapped diverged")
    }
  }

  // ---- q102: incremental span, index-side window df-cap -------------

  /** Like [[incrementalFrames]] but span-shaped: the hot text is ONE
    * boilerplate window (exactly [[Dedup.WindowLen]] tokens), so corpus
    * hot docs carry (hot df=m, unique-tail df=1) windows, each batch hot
    * doc IS the hot window (containment 1.0 to every hot corpus doc —
    * the fan-out hazard), and planted pair j spans the boundary with
    * identical unique 20-token text. */
  private def spanFrames(sh: Shape) = {
    val corpus = ((1L to sh.mCorpus.toLong).map(i => (i, s"${sh.hotText} t$i")) ++
      (0 until sh.planted).map(j => (3001L + j, sh.pairText(j)))).toDF("doc_id", "text")
    val batch = ((1L to sh.mBatch.toLong).map(i => (1000L + i, sh.hotText)) ++
      (0 until sh.planted).map(j => (2001L + j, sh.pairText(j)))).toDF("doc_id", "text")
    (batch, corpus)
  }

  private def spanShape(overCap: Boolean, seed: Long): Shape = {
    val sh = draw(shapeGen(overCap, pairLen = Dedup.WindowLen), seed)
    sh.copy(hotWords = draw(Gen.listOfN(Dedup.WindowLen, word), seed + 7000))
  }

  test("q102 property: index window cap keeps exactly the planted admissions") {
    (0 until 5).foreach { i =>
      val (batch, corpus) = spanFrames(spanShape(overCap = true, 800 + i))
      val sh = spanShape(overCap = true, 800 + i)
      val capped = Dedup.spanIncrementalFrom(batch, corpus, Cap)
      val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until sh.planted).map(j => (2001L + j, 3001L + j)).toSet
      assert(got == want, s"shape $i ($sh): got ${got.size} pairs, want $want")
      val m = capped.queryExecution.observedMetrics("graft.cap(winindex_df)")
      assert(m.getAs[Long]("hot_buckets") == 1L, s"shape $i: $m")
      assert(m.getAs[Long]("dropped_rows") == sh.mCorpus.toLong, s"shape $i: $m")
      val uncapped = Dedup.spanIncrementalFrom(batch, corpus, Int.MaxValue).count()
      assert(uncapped == sh.mBatch.toLong * sh.mCorpus + sh.planted,
        s"shape $i: uncapped=$uncapped")
    }
  }

  test("q102 property: cap is a no-op when every index window df is under it") {
    (0 until 3).foreach { i =>
      val (batch, corpus) = spanFrames(spanShape(overCap = false, 900 + i))
      val a = Dedup.spanIncrementalFrom(batch, corpus, Cap).collect().toSeq
      val b = Dedup.spanIncrementalFrom(batch, corpus, Int.MaxValue).collect().toSeq
      assert(a == b && a.nonEmpty, s"shape $i: capped/uncapped diverged")
    }
  }

  // ---- q86: semantic dedup, cluster-size cap ------------------------

  import graft.operators.Similarity

  /** Random semantic shape: one degenerate cluster of mHot identical
    * vectors (all-pairs matches — the quadratic hazard the cap exists
    * for) + `planted` normal clusters, each holding one identical dup
    * pair plus an ORTHOGONAL member (cos 0 — must never be dropped,
    * proving the threshold discriminates within the kept clusters). */
  private case class SemShape(mHot: Int, planted: Int)
  private def semShapeGen(overCap: Boolean): Gen[SemShape] = for {
    mHot <- if (overCap) Gen.chooseNum(Cap + 1, 160) else Gen.chooseNum(2, Cap - 1)
    planted <- Gen.chooseNum(1, 3)
  } yield SemShape(mHot, planted)

  private def semAssign(sh: SemShape) = {
    val v = Array(1000000L, 0L); val orth = Array(0L, 1000000L)
    val qn = 1000000L * 1000000L
    val hot = (1L to sh.mHot.toLong).map(i => (i, 0L, v, qn))
    val planted = (0 until sh.planted).flatMap { j =>
      Seq((2000L + 10 * j, 100L + j, v, qn),
        (2001L + 10 * j, 100L + j, v, qn),
        (2002L + 10 * j, 100L + j, orth, qn))
    }
    (hot ++ planted).toDF("vec_id", "cent_id", "q", "qn")
  }

  test("q86 property: cluster cap keeps exactly the planted per-cluster dups") {
    (0 until 5).foreach { i =>
      val sh = draw(semShapeGen(overCap = true), 600 + i)
      val assign = semAssign(sh)
      val capped = Similarity.semDedupFrom(assign, Cap)
      val rows = capped.collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until sh.planted).map(j => (2001L + 10 * j, 2000L + 10 * j)).toSet
      assert(got == want, s"shape $i ($sh): got $got, want $want")
      // orthogonal members survive; drops carry exact provenance
      assert(rows.forall(r => r.getLong(2) == 1L && r.getDouble(3) == 1.0))
      val m = capped.queryExecution.observedMetrics("graft.cap(sem_cluster)")
      assert(m.getAs[Long]("hot_clusters") == 1L, s"shape $i: $m")
      assert(m.getAs[Long]("excluded_rows") == sh.mHot.toLong, s"shape $i: $m")
      // uncapped control: the hot cluster collapses to keep-min — the
      // generated cluster really was the quadratic-match hazard
      val un = Similarity.semDedupFrom(assign, Int.MaxValue).count()
      assert(un == (sh.mHot - 1).toLong + sh.planted, s"shape $i: uncapped=$un")
    }
  }

  test("q86 property: cap is a no-op when every cluster is under it") {
    (0 until 3).foreach { i =>
      val sh = draw(semShapeGen(overCap = false), 700 + i)
      val assign = semAssign(sh)
      val a = Similarity.semDedupFrom(assign, Cap).collect().toSeq
      val b = Similarity.semDedupFrom(assign, Int.MaxValue).collect().toSeq
      assert(a == b && a.nonEmpty, s"shape $i ($sh): capped/uncapped diverged")
    }
  }
}
