package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup-family behavior on the sf0.001 testdata (500 docs, 25 planted
  * near-dup pairs at Jaccard ≈ 0.99, no exact duplicates) plus
  * constructed exact-dup inputs. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup keeps the min-doc_id row per normalized text") {
    val df = Seq(
      (3L, "Hello  World ", "s1"),
      (1L, "hello world", "s2"),
      (2L, "different", "s3"),
    ).toDF("doc_id", "text", "source")
    val kept = Dedup.exactDedup(df).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L)) // 3 collapses onto 1 via normText
  }

  test("minhashLsh finds the planted near-dup pairs, est_j in [0.5, 1]") {
    val got = Dedup.minhashLsh(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length >= 20) // 25 planted pairs, minus est_j noise
    assert(got.forall { case (a, b, n, e) =>
      a < b && n >= 8 && n <= 16 && e >= 0.5 && e <= 1.0
    })
  }

  test("minhashLsh candidates ⊇ exact-Jaccard pairs (banding recall on planted dups)") {
    val lsh = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(spark, sfDir)
      .filter(col("jac") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // at jaccard ≈ 0.99 every band should match with overwhelming prob.
    assert(exact.nonEmpty)
    assert((exact -- lsh).isEmpty,
      s"planted pairs missed by LSH: ${exact -- lsh}")
  }

  test("simhash near-dup pairs are low-Hamming and cover planted dups") {
    val sim = Dedup.simhash(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(sim.forall { case (a, b, h) => a < b && h >= 0 && h <= 6 })
    val simSet = sim.map(p => (p._1, p._2)).toSet
    val exact = Dedup.ngramJaccard(spark, sfDir)
      .filter(col("jac") >= 0.95).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & simSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall too low")
  }

  test("q77 incremental LSH == full recompute restricted to batch×corpus pairs") {
    // the point of the incremental path: signing only the batch and
    // joining against the persisted index must find EXACTLY the pairs
    // the full-corpus recompute finds across the batch/corpus boundary
    // (batch×batch and corpus×corpus pairs are by-design out of scope)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val inc = Dedup.incrementalLshFrom(
        docs.filter(pmod($"doc_id", lit(5)) === 0),
        docs.filter(pmod($"doc_id", lit(5)) =!= 0), Int.MaxValue)
      .select("doc_new", "doc_corpus", "n_eq")
      .as[(Long, Long, Long)].collect().toSet
    val full = Dedup.minhashLshFrom(docs, Int.MaxValue)
      .select("doc_a", "doc_b", "n_eq").as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, n) => if (a % 5 == 0) (a, b, n) else (b, a, n) }
      .toSet
    assert(inc.nonEmpty, "testdata must contain cross-boundary near-dups")
    assert(inc == full,
      s"incremental != recompute: only-inc=${inc -- full}, only-full=${full -- inc}")
  }

  test("q78 span overlap is alignment-independent: a shared span is found at ANY offset") {
    // the property stride-1 windows buy over strided chunking: the same
    // 25-token span sits at offset 3 in doc 1 and offset 0 in doc 2 —
    // a stride-10 chunker would hash it at incompatible boundaries and
    // find nothing; stride-1 guarantees span-20+1 = 6 matching windows
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"pre1 pre2 pre3 $span"),
      (2L, s"$span post1 post2 post3 post4 post5"),
      (3L, (1 to 30).map(i => s"other$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val got = Dedup.spanOverlapFrom(docs, Int.MaxValue)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    val (_, _, shared, minW, cont) = got.head
    assert(shared == 6L, s"expected 6 shared windows, got $shared")
    assert(minW == 9L && math.abs(cont - 6.0 / 9.0) < 1e-15)
  }

  test("q99/q100: planted shared span is scored and localized exactly") {
    // the q78 fixture viewed through the per-doc taggers: a 25-token
    // span shared at different offsets is 6 duplicated stride-1 windows
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"pre1 pre2 pre3 $span"),                       // 28 toks, 9 windows, span windows at pos 4..9
      (2L, s"$span post1 post2 post3 post4 post5"),        // 30 toks, 11 windows, span windows at pos 1..6
      (3L, (1 to 30).map(i => s"other$i").mkString(" ")),  // 11 windows, none shared
    ).toDF("doc_id", "text")
    val frac = Dedup.dupSpanFractionFrom(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(frac == Seq(
      (1L, 9L, 6L, 6.0 / 9.0),
      (2L, 11L, 6L, 6.0 / 11.0),
      (3L, 11L, 0L, 0.0)))
    // localization: doc 3 (nothing duplicated) must NOT appear; the
    // span lands at its exact offset with span_tokens = 25 on both
    val spans = Dedup.dupSpansFrom(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq(
      (1L, 1L, 4L, 6L, 25L),
      (2L, 1L, 1L, 6L, 25L)))
  }

  test("q100 separates disjoint spans and reports the longest") {
    // doc 4 shares spanA (with doc 5) at its head and spanB (with doc
    // 6) at its tail, 20 unique filler tokens apart — two maximal runs,
    // not one; the longest (6 windows vs 3) wins the report
    val spanA = (1 to 25).map(i => s"a$i").mkString(" ")
    val spanB = (1 to 22).map(i => s"b$i").mkString(" ")
    val filler = (1 to 20).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (4L, s"$spanA $filler $spanB"),
      (5L, s"$spanA u1 u2 u3 u4 u5"),
      (6L, s"v1 v2 v3 v4 v5 $spanB"),
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpansFrom(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 4: spanA windows at pos 1..6, spanB (toks 46..67) at 46..48
    assert(got == Seq(
      (4L, 2L, 1L, 6L, 25L),
      (5L, 1L, 1L, 6L, 25L),
      (6L, 1L, 6L, 3L, 22L)))
  }

  test("q102 incremental span admission: batch-vs-corpus only, new-side containment") {
    // a batch doc that is PURE corpus material scores containment 1.0;
    // batch-internal and corpus-internal shared spans are out of scope
    // by construction (the full graph is q78's business)
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val other = (1 to 25).map(i => s"t$i").mkString(" ")
    val batch = Seq(
      (5L, span),                                          // 6 windows, all in corpus doc 11
      (10L, s"$other x1 x2 x3 x4 x5"),                     // shares `other` with batch doc 15 ONLY
      (15L, s"y1 y2 y3 y4 y5 $other"),
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (11L, s"c1 c2 c3 $span c4 c5"),
      (12L, (1 to 40).map(i => s"z$i").mkString(" ")),
      (13L, (1 to 40).map(i => s"z$i").mkString(" ")),     // corpus-internal dup of 12
    ).toDF("doc_id", "text")
    val got = Dedup.spanIncrementalFrom(batch, corpus, Int.MaxValue)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((5L, 11L, 6L, 6L, 1.0)),
      s"expected only the batch->corpus admission row, got $got")
  }

  test("q101 span trim keeps the canonical copy and cuts every other occurrence") {
    // keep-min at span granularity: doc 1 (smallest id containing the
    // shared span) survives verbatim; doc 2's copy is cut — exactly
    // the 25 span tokens — and the untouched doc is bit-identical
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"pre1 pre2 pre3 $span"),
      (2L, s"$span post1 post2 post3 post4 post5"),
      (3L, (1 to 30).map(i => s"other$i").mkString(" ")),
    ).toDF("doc_id", "text")
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup.spanTrimFrom(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 28L, 28L, md5hex(s"pre1 pre2 pre3 $span")),
      (2L, 30L, 5L, md5hex("post1 post2 post3 post4 post5")),
      (3L, 30L, 30L, md5hex((1 to 30).map(i => s"other$i").mkString(" ")))))
  }

  test("dupClusters: driver union-find == distributed min-label propagation") {
    val pairs = Dedup.minhashLsh(spark, sfDir).select("doc_a", "doc_b")
    val viaDriver = Dedup.dupClusters(spark, sfDir) // small graph -> driver path
      .as[(Long, Long, Long)].collect().toSeq
    val viaLoop = Dedup.dupClustersDistributed(pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaDriver == viaLoop)
    assert(viaDriver.nonEmpty)
    // cluster id is the min member: strictly less than max_doc for real clusters
    assert(viaDriver.forall { case (cid, n, mx) => n >= 2 && cid < mx })
  }

  test("dedupIncremental: batch docs duplicated in the corpus are dropped") {
    // incoming = doc_id % 5 == 0; testdata sf0.001 has no exact dups,
    // so every incoming doc is new and totals must add up per source
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nIncoming = docs.filter(col("doc_id") % 5 === 0).count()
    val kept = Dedup.dedupIncremental(spark, sfDir)
      .agg(sum("n_new")).as[Long].collect().head
    assert(kept == nIncoming && kept > 0)
  }

  test("ngramJaccard is exact: inter ≤ min(na, nb) implies jac ≤ 1") {
    val got = Dedup.ngramJaccard(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, i, u, j) =>
      a < b && i <= u && j >= 0.5 && j <= 1.0 && j == i.toDouble / u.toDouble
    })
  }

  test("dupDegree: handshake lemma — Σ(degree · n_docs) == 2 · |pairs|") {
    val pairs = Dedup.minhashLsh(spark, sfDir).count()
    val degSum = Dedup.dupDegree(spark, sfDir)
      .agg(sum(col("degree") * col("n_docs"))).as[Long].collect().head
    assert(pairs > 0 && degSum == 2 * pairs)
  }

  test("dedupRetention: drops == Σ(cluster size − 1), totals conserve") {
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    val ret = Dedup.dedupRetention(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(ret.map(_._2).sum == docs)
    assert(ret.forall { case (_, n, k, d) => n == k + d })
    // keep-one-per-cluster drops exactly (size - 1) docs per cluster
    val clusterDrops = Dedup.dupClusters(spark, sfDir)
      .agg(sum(col("n_docs") - 1)).as[Long].collect().head
    assert(ret.map(_._4).sum == clusterDrops && clusterDrops > 0)
  }

  test("sourceOverlap: matrix mass == |pairs|, keys upper-triangular") {
    val pairs = Dedup.minhashLsh(spark, sfDir).count()
    val m = Dedup.sourceOverlap(spark, sfDir)
      .as[(String, String, Long)].collect()
    assert(m.map(_._3).sum == pairs)
    assert(m.forall { case (a, b, n) => a <= b && n > 0 })
  }

  test("q88 containment catches the subset-dup that Jaccard misses by construction") {
    // docB fully contains docA's text plus 3x more: every docA shingle
    // is in docB, so containment = 1.0, while Jaccard ~ |A|/|B| < 0.5
    val core = (1 to 12).map(i => s"w$i").mkString(" ")
    val extra = (1 to 36).map(i => s"x$i").mkString(" ")
    val docs = Seq((0L, core), (1L, s"$core $extra")).toDF("doc_id", "text")
    val cont = Dedup.containmentFrom(docs, Int.MaxValue)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(cont.map(r => (r._1, r._2, r._6)).toSeq == Seq((0L, 1L, 1.0)),
      cont.mkString(","))
    // na = docA's 10 shingles, all intersecting
    assert(cont.head._3 == 10L && cont.head._4 == 10L)
    val jac = Dedup.ngramJaccardFrom(docs, Int.MaxValue).count()
    assert(jac == 0L, "Jaccard >= 0.5 should NOT fire on a 1:4 subset dup")
  }

  test("q88 containment == 10/min rule at the 0.8 boundary, exact-integer gate") {
    // A has 10 shingles, B shares exactly 8 of them: containment 0.8
    // passes; C shares 7: 0.7 fails. Construct via token runs with
    // unique separators so shingle sets are controlled... simpler:
    // verify on sf0.001 that every emitted row satisfies the exact
    // gate and its double ratio
    val got = Dedup.containment(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, inter, na, nb, c) =>
      assert(a < b && inter * 10 >= math.min(na, nb) * 8)
      assert(c == inter.toDouble / math.min(na, nb).toDouble)
    }
  }

  test("q89 integer PageRank reproduces the hand-computed fixpoint on a path graph") {
    // path 1-2-3: hub 2 has degree 2. Hand-rolled three iterations of
    // r' = 150000 + (850 * sum(r div deg)) div 1000 from r0 = 1000000
    // (the sum-to-N scale matching the 150000 + 850000 fixpoint):
    // r1 = (575000, 1850000, 575000), r2 = (936250, 1127500, 936250),
    // r3 = (629187, 1741625, 629187)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupPagerankFrom(pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 1741625L), (1L, 1L, 629187L), (3L, 1L, 629187L)))
  }

  test("deep PageRank == lazy composition at depth 6, with plan depth bounded") {
    // a shape with hubs and a tail so ranks separate: star 1-{2,3,4}
    // plus path 4-5-6-7 plus an isolated pair 8-9
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (8L, 9L)).toDF("doc_a", "doc_b")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq
    // checkpointEvery >= iters never truncates mid-run: the pure lazy
    // composition at depth 6
    val lazy6 = Dedup.dupPagerankDeepFrom(pairs, 6, Int.MaxValue)
    // truncating every 2 iterations must be bit-identical (integer math)
    val deep6 = Dedup.dupPagerankDeepFrom(pairs, 6, 2)
    assert(ranks(deep6) == ranks(lazy6))
    // and at depth 3 both agree with q89's lazy form exactly
    assert(ranks(Dedup.dupPagerankDeepFrom(pairs, 3, 2)) ==
      ranks(Dedup.dupPagerankFrom(pairs)))
    // the point of the variant: the analyzed plan of the checkpointed
    // run stays O(checkpointEvery) — the lazy depth-6 plan is strictly
    // larger, and deep-6's plan is no bigger than a lazy TWO-iteration
    // plan rebased on checkpoint scans (its tail since the last cut)
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.length
    val lazy2 = Dedup.dupPagerankDeepFrom(pairs, 2, Int.MaxValue)
    assert(planNodes(deep6) < planNodes(lazy6),
      s"deep=${planNodes(deep6)} lazy=${planNodes(lazy6)}")
    assert(planNodes(deep6) <= planNodes(lazy2),
      s"deep6=${planNodes(deep6)} lazy2=${planNodes(lazy2)}")
  }

  test("q89 on the corpus: every pair-graph node ranked once, damping bounds hold") {
    val pr = Dedup.dupPagerank(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(pr.nonEmpty)
    // every node of the pair graph is ranked exactly once
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(pr.map(_._1).toSet == nodes && pr.length == nodes.size)
    // damping bounds on the sum-to-N scale: the teleport term floors
    // every rank at 150000, and total mass is conserved up to integer
    // truncation — each iteration loses < deg(u) micro-units per node
    // to `r div deg` and < 1 to `div 1000`, so over 3 iterations the
    // sum sits in (N*1e6 - 3*(2*|pairs| + N), N*1e6]
    val n = nodes.size.toLong
    val mass = pr.map(_._3).sum
    assert(pr.forall(_._3 >= 150000L))
    assert(mass <= 1000000L * n && mass > 1000000L * n - 3L * (2L * pairs.length + n),
      s"mass=$mass n=$n pairs=${pairs.length}")
    assert(pr.forall(_._2 >= 1L))
    // deterministic: a fresh plan reproduces ranks bit-for-bit
    val again = Dedup.dupPagerank(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(again.toSeq == pr.toSeq)
  }
}
