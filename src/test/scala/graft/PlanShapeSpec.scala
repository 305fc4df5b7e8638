package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression tests: the scan/shuffle/broadcast shapes
  * the 100 TB design depends on (SURVEY §8/§9) must survive refactors.
  * Assertions are deliberately coarse — they pin the plan *class*
  * (what shuffles, what broadcasts, what reaches the scan), not its
  * cosmetics. */
class PlanShapeSpec extends SparkSpec {

  /** Final (post-AQE) executed plan: run the query first so
    * AdaptiveSparkPlan reports the real stages incl. codegen `*(n)`
    * markers, not the pre-execution sketch. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    // keep only the final-plan section — the adaptive toString appends
    // the initial plan too, which would double-count every operator
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def countOf(p: String, token: String): Int =
    token.r.findAllIn(p).length

  test("q01: column pruning and filter pushdown reach the lineitem scan") {
    val p = plan("q01_delay_avg")
    // scan must not read the 16-column table — only the 5 used columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "unused column read at scan")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(l_linestatus,F)"), s"filter not pushed:\n$p")
  }

  test("q06: dimension joins broadcast, fact side never shuffles for the join") {
    val p = plan("q06_region_revenue")
    assert(countOf(p, "BroadcastHashJoin") >= 2, "dims not broadcast")
  }

  test("q57: contamination is a broadcast join — corpus never shuffles pre-join") {
    val p = plan("q57_contamination")
    assert(p.contains("BroadcastHashJoin"))
    // shuffles: bench distinct + final agg + orderBy only
    assert(countOf(p, "ShuffleExchange|Exchange hashpartitioning|Exchange rangepartitioning") <= 4,
      s"unexpected extra shuffles:\n$p")
  }

  test("q60: k-means assignment is a broadcast nested loop, argmin without sort") {
    val p = plan("q60_kmeans_step")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("PushedFilters") && p.contains("LessThan(vec_id,8)"))
    assert(!p.contains("Window"), "argmin must be groupBy min(struct), not a window sort")
  }

  test("q20: exact dedup needs only the hash-key shuffle plus summary agg/sort") {
    val p = plan("q20_exact_dedup")
    // window dedup on normText hash + per-source summary + output sort;
    // the kept-vs-total comparison joins broadcast
    val shuffles = countOf(p, "Exchange (hash|range)partitioning")
    assert(shuffles <= 4, s"dedup shuffled $shuffles times:\n$p")
    assert(p.contains("BroadcastHashJoin"), "summary join should broadcast")
  }

  test("q25: probes broadcast; the corpus side of top-k never shuffles before scoring") {
    val p = plan("q25_cosine_topk")
    assert(p.contains("Broadcast"), s"probe side not broadcast:\n$p")
  }

  test("q21/q23: skew-cap machinery reuses the shingle pipeline — one scan at runtime") {
    // the caps' cost argument rests on AQE stage reuse: the hot-set
    // aggregate and the capped stream must share ONE execution of the
    // tokenize->shingle->md5 pipeline (static explain shows the subtree
    // 4-6x; the runtime plan must not). q21 is pinned on the UNCACHED
    // builder — the session pair-graph cache would hide the scan.
    val df21 = graft.operators.Dedup.minhashLshFrom(
      graft.sources.Tables.documents(spark, sfDir), graft.operators.Dedup.MaxLshBucket)
    df21.collect()
    val p21 = df21.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(countOf(p21, "Scan parquet") == 1, s"q21 re-scanned documents:\n$p21")
    assert(p21.contains("ReusedExchange"), s"q21 lost exchange reuse:\n$p21")
    // q23/q88's INLINE builders keep the one-scan/reuse contract (the
    // spec surface, matching q21's treatment); their product paths now
    // read the written shingle table — pinned separately below
    val df23 = graft.operators.Dedup.ngramJaccardFrom(
      graft.sources.Tables.documents(spark, sfDir), graft.operators.Dedup.MaxShingleDf)
    df23.collect()
    val p23 = df23.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(countOf(p23, "Scan parquet") == 1, s"q23 re-scanned documents:\n$p23")
    assert(p23.contains("ReusedExchange"), s"q23 lost exchange reuse:\n$p23")
    // q78 copies q23's barrier pattern on the window hash — same pin
    val p78 = plan("q78_span_overlap")
    assert(countOf(p78, "Scan parquet") == 1, s"q78 re-scanned documents:\n$p78")
    assert(p78.contains("ReusedExchange"), s"q78 lost exchange reuse:\n$p78")
  }

  test("q23/q88 product paths read the WRITTEN bucketed shingle table — no re-shingling") {
    // the set-overlap family's shared intermediate is a snapshot table
    // (like the pair graph and band index): query time must scan
    // graft_shingles — bucketed on h, so the df-count and self-join
    // need no exchange on h — and never re-run tokenize→shingle→md5
    for (name <- Seq("q23_ngram_jaccard", "q88_containment")) {
      val p = plan(name)
      assert(p.contains("graft_shingles"), s"$name not reading the shingle table:\n$p")
      assert(p.contains("Bucketed: true"), s"$name scan ignores the h-bucketing:\n$p")
      assert(!p.contains("MapPartitions"), s"$name re-shingled at query time:\n$p")
      assert(!p.contains("Exchange hashpartitioning(h#"),
        s"$name re-shuffled on h despite the bucketing:\n$p")
    }
  }

  test("q87: one scan, one model exchange — occ/c2/c1 share the repartition(u) barrier") {
    // the bigram model derives three relations (per-doc occurrences,
    // bigram counts, prefix counts) from one exploded scan; the
    // repartition(u) barrier must be built once and reused, and since
    // hashpartitioning(u) satisfies every downstream grouping
    // ([u] ⊆ [doc,u,v], [u,v], [u]), none of the model aggregates may
    // introduce a further shuffle — only the final per-doc rollup and
    // output sort shuffle after it.
    val p = plan("q87_bigram_lm")
    assert(countOf(p, "Scan parquet") == 1, s"q87 re-scanned documents:\n$p")
    assert(p.contains("ReusedExchange"), s"q87 lost exchange reuse:\n$p")
    // a ReusedExchange line repeats its target's "Exchange hash..."
    // description — subtract them to count real shuffles
    val shuffles = countOf(p, "Exchange (hash|range)partitioning") - countOf(p, "ReusedExchange")
    assert(shuffles <= 3, s"q87 shuffled $shuffles times (expect u-barrier + doc rollup + sort):\n$p")
  }

  test("q99/q100: linear span profilers — one scan, no join anywhere") {
    // both taggers compute corpus-wide window df as a WINDOW AGGREGATE
    // over the hash, so the whole query is one subtree: a single
    // documents scan, the h exchange, the doc_id exchange(s), the
    // output sort — and NO join node at all (an agg-plus-join-back
    // formulation canonicalizes its two branches differently under
    // column pruning and costs a second scan; pair fan-out is q78's
    // business, these are strictly linear)
    for (name <- Seq("q99_dup_span_fraction", "q100_dup_spans")) {
      val p = plan(name)
      assert(countOf(p, "Scan parquet") == 1, s"$name re-scanned documents:\n$p")
      assert(!p.contains("Join"), s"$name grew a join:\n$p")
      val shuffles = countOf(p, "Exchange (hash|range)partitioning") - countOf(p, "ReusedExchange")
      assert(shuffles <= 3,
        s"$name shuffled $shuffles times (expect h window + doc rollup + sort):\n$p")
    }
  }

  test("q101: span trim is two linear passes — token pass + window pass, one rollup") {
    // removal is mark-and-reassemble: the token pass (row_number
    // indexing) left-joins the covered-index set derived from the
    // window pass, and counts + trimmed-text assembly ride ONE rollup
    // (a separate n_before aggregate would canonicalize as a third
    // documents scan); nothing pairwise, no cartesian anywhere
    val p = plan("q101_span_trim")
    assert(countOf(p, "Scan parquet") == 2,
      s"q101 expects exactly token + window scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q101 grew a non-equi join:\n$p")
  }

  test("q102: the corpus window index is a written bucketed table — only the batch re-windows") {
    plan("q102_span_incremental") // first run writes the index table
    val p = plan("q102_span_incremental")
    assert(p.contains("graft_winindex"),
      s"q102 not reading the written window index:\n$p")
    assert(p.contains("Bucketed: true"),
      s"q102 index scan ignores the h-bucketing:\n$p")
    // per ingest: the batch windows itself (two MapPartitions — the
    // size aggregate and the join probe each window the small batch;
    // both are O(batch)); the corpus is never re-windowed, so the
    // only scans are batch docs (×2) + the index table
    assert(p.contains("MapPartitions"), s"q102 lost the batch window loop:\n$p")
    assert(countOf(p, "Scan parquet") <= 3,
      s"q102 scanned beyond batch + index table:\n$p")
  }

  test("round-11 delete/compose censuses: equi-joins only, no cartesian anywhere") {
    // the refill deletes and the append-then-delete composition are
    // anti/semi/equi joins + window re-ranks over published tables —
    // a nested-loop shape appearing here would mean a takedown scans
    // pairs, the exact blowup the banded/bucketed designs exist to
    // avoid
    Seq("q116_ann_delete_graph", "q117_ann_delete_base",
        "q120_ann_append_delete").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$name grew a non-equi join:\n$p")
    }
  }

  test("the streaming doors' gated reads consume their sink tables, not a re-run") {
    // the stream executes once per (session, snapshot) inside the
    // artifact build; the GATED relation must be a plain read of the
    // republished sink table (plus the explode/sort) — zero streaming
    // machinery, zero source re-scan in the query path
    val p119 = plan("q119_stream_index_door")
    assert(p119.contains("graft_sdoorout"),
      s"q119 not reading the sink table:\n$p119")
    val p121 = plan("q121_stream_media_door")
    assert(p121.contains("graft_mdoorout"),
      s"q121 not reading the sink table:\n$p121")
    Seq(p119, p121).foreach(p =>
      assert(countOf(p, "Scan parquet") <= 1, s"door re-scanned beyond its sink:\n$p"))
  }

  test("dedup family consumes ONE written pair-graph table — no shingle recomputation") {
    // q21 produces the pair-graph TABLE (graft.sources.Layout
    // materializedTable — the per-snapshot production artifact);
    // q70/q72 (and q38/q76 via dupLabels) must read the on-disk copy,
    // not re-run tokenize->minhash->band. Executed-plan evidence:
    // q70's only scan is the pair-graph table, and q72 adds only its
    // two slim (doc_id, source) corpus projections.
    plan("q21_minhash_lsh") // writes the pair-graph table
    val p70 = plan("q70_dup_degree")
    assert(p70.contains("graft_pairgraph"),
      s"q70 not reading the written pair graph:\n$p70")
    assert(countOf(p70, "Scan parquet") == 1,
      s"q70 scanned beyond the pair-graph table:\n$p70")
    assert(countOf(p70, "MapPartitions") == 0,
      s"q70 re-ran the shingle pipeline:\n$p70")
    val p72 = plan("q72_source_overlap")
    // pair-graph table + two slim (doc_id, source) corpus scans — one
    // per pair endpoint, both broadcast — are the design; what must NOT
    // appear is the signature pipeline (the MapPartitions shingle loop)
    assert(p72.contains("graft_pairgraph"),
      s"q72 not reading the written pair graph:\n$p72")
    assert(countOf(p72, "Scan parquet") <= 3,
      s"q72 scans beyond pair graph + two corpus projections:\n$p72")
    assert(countOf(p72, "MapPartitions") == 0,
      s"q72 re-ran the shingle pipeline:\n$p72")
  }

  test("q77: the corpus band index is a written bucketed table — only the batch is re-signed") {
    plan("q77_incremental_lsh") // first run writes the index table
    val p = plan("q77_incremental_lsh")
    assert(p.contains("graft_bandindex"),
      s"q77 not reading the written band index:\n$p")
    assert(p.contains("Bucketed: true"),
      s"q77 index scan ignores the (band, bval) bucketing:\n$p")
    // per ingest: ONE signature loop (the batch side) over the batch
    // docs scan; the only other scan is the index table itself — the
    // corpus is never re-signed
    assert(countOf(p, "MapPartitions") == 1, s"q77 re-signed the corpus:\n$p")
    assert(countOf(p, "Scan parquet") == 2,
      s"q77 scanned beyond batch + index table:\n$p")
  }

  test("q82: graph update reads the written tables and signs only the batch") {
    val p = plan("q82_pair_graph_update")
    assert(p.contains("graft_pairgraphbase"),
      s"q82 not reading the previous snapshot's graph table:\n$p")
    assert(p.contains("graft_bandindex"),
      s"q82 not reading the written band index:\n$p")
    // O(batch) signing: the ONE batch band table (its exchange reused
    // by the cross join and the self join) is the only signature loop;
    // the corpus is never re-signed
    assert(countOf(p, "MapPartitions") == 1, s"q82 re-signed beyond the batch:\n$p")
    assert(p.contains("ReusedExchange"), s"q82 lost batch band-table reuse:\n$p")
    // scans: batch documents + the two written tables, nothing else
    assert(countOf(p, "Scan parquet") == 3, s"q82 scanned beyond batch+tables:\n$p")
  }

  test("q81: the end-to-end pipeline is one scan + three exchanges") {
    // dedup window (hash on text hash) + packing window (hash on
    // source, reused by the rollup) + final sort — the documented
    // composition shuffle budget; gates and chunk math are map-side
    val p = plan("q81_pipeline_e2e")
    assert(countOf(p, "Scan parquet") == 1, s"q81 must read documents once:\n$p")
    assert(countOf(p, "Exchange (hash|range)partitioning") <= 3,
      s"q81 shuffled beyond dedup window + packing window + sort:\n$p")
    // the rollup must NOT add a fourth exchange on top of the packing
    // window's partitioning
    assert(countOf(p, "Exchange hashpartitioning") <= 2,
      s"per-source rollup re-shuffled after the packing window:\n$p")
  }

  test("q73: the filter funnel is one scan + one rollup shuffle (+ sort)") {
    val p = plan("q73_filter_funnel")
    assert(countOf(p, "Scan parquet") == 1, s"funnel must read documents once:\n$p")
    // the per-partition gate loop feeds a partial agg; only the rollup
    // exchange and the final rangepartitioning sort may shuffle
    assert(countOf(p, "Exchange (hash|range)partitioning") <= 2,
      s"funnel shuffled more than rollup+sort:\n$p")
  }

  test("q74: token chunking is map-only before the rollup") {
    val p = plan("q74_token_chunks")
    assert(countOf(p, "Scan parquet") == 1)
    assert(countOf(p, "Exchange (hash|range)partitioning") <= 2,
      s"chunking shuffled more than rollup+sort:\n$p")
    assert(!p.contains("Generate"), "chunk math must not explode rows")
  }

  test("q96/q97/q98: recall harness shares subtrees — one baseline, one index scan per sweep") {
    // q96's contract after the round-10 exacttopk materialization:
    // the exact baseline is no longer evaluated AT ALL per run — the
    // harness reads the written `graft_exacttopk` snapshot table
    // (≤ 5·MaxProbes slim rows), so the raw embeddings file is
    // scanned exactly twice (probe count + re-rank side). History:
    // the per-branch formulation scanned it 10 times (4.7 s), the
    // round-7 single-intersection fix 4 times (2.9 s), and pricing
    // the baseline once per SNAPSHOT instead of once per QUERY
    // removes the remaining two baseline scans.
    val p96 = plan("q96_ann_recall")
    assert(countOf(p96, "embeddings.parquet") == 2,
      s"q96 re-evaluated the exact baseline:\n$p96")
    assert(countOf(p96, "graft_exacttopk") > 0,
      s"q96 does not read the written ground-truth table:\n$p96")
    // q97's one-plan claim: all four nprobe levels are served by ONE
    // bucket-pruned scan of the written assignment on the INDEX side;
    // the probe side adds a second assignment read (the bounded probe
    // set now routes DISTRIBUTED — round 8 — instead of transiting
    // the driver, so its source scan appears in the plan) and exactly
    // one MapPartitions: the routing pass, not a quantization loop
    val p97 = plan("q97_nprobe_curve")
    assert(countOf(p97, "spark_catalog.default.graft_ivfassign") == 2,
      s"q97's assignment reads should be index side + probe side:\n$p97")
    assert(p97.contains("Bucketed: true") && p97.contains("PushedFilters: [In(cent_id"),
      s"q97 lost bucket pruning:\n$p97")
    assert(countOf(p97, "MapPartitions") == 1,
      s"q97 should carry exactly the routing MapPartitions:\n$p97")
    // the only local relations are the 4-row level table (joined at
    // two points) — a collected (driver-routed) probe relation would
    // surface as a LocalTableScan carrying probe columns
    assert(p97.linesIterator.filter(_.contains("LocalTableScan"))
        .forall(_.contains("[nprobe")),
      s"q97 still ships a collected (driver-routed) probe relation:\n$p97")
    // with the baseline a written table (round 10), q97 touches the
    // raw embeddings file ZERO times — probes come off the written
    // assignment, ground truth off graft_exacttopk
    assert(countOf(p97, "embeddings.parquet") == 0,
      s"q97 re-evaluated the exact baseline:\n$p97")
    assert(countOf(p97, "graft_exacttopk") > 0,
      s"q97 does not read the written ground-truth table:\n$p97")
    // q98: the ADC ranking is computed once for all four shortlists
    // (one code-table scan), and the baseline once; probe count is a
    // driver literal here too
    val p98 = plan("q98_shortlist_curve")
    assert(countOf(p98, "spark_catalog.default.graft_pqcodes") == 1,
      s"q98 re-ranked the code table per level:\n$p98")
    assert(countOf(p98, "embeddings.parquet") == 1,
      s"q98 re-evaluated the exact baseline:\n$p98")
    assert(countOf(p98, "graft_exacttopk") > 0,
      s"q98 does not read the written ground-truth table:\n$p98")
  }

  test("q140: two pruned scans, one melt exchange shared by both profile passes") {
    val p = plan("q140_corpus_profile")
    // scalar pass + ONE melt pass — the distinct rollup and the
    // heavy-hitter branch both consume the same (cname, v) exchange
    // (the nullable count(CASE WHEN cnt > 0 ...) reference in profTopK
    // is what keeps the subtrees canonically equal; losing it doubled
    // the corpus-bytes melt in round 13)
    assert(countOf(p, "Scan parquet") == 2, s"q140 scan count changed:\n$p")
    assert(p.contains("ReusedExchange"), s"q140 lost melt-exchange reuse:\n$p")
    // rank pushdown caps every map partition at 3 rows per column
    // BEFORE the window exchange — the window never sorts or skews on
    // a corpus-cardinality group; eligibility is the final projection's
    // CASE over measured n_distinct, no join machinery needed
    assert(countOf(p, "WindowGroupLimit") >= 2,
      s"q140 lost rank pushdown (partial+final WindowGroupLimit):\n$p")
  }

  test("q142: index side joins bucket-aligned — no exchange above the profcounts scan") {
    val p = plan("q142_profile_update")
    // the written standing-corpus counts index is bucketed on
    // (cname, v); the merge with the melted batch must read it
    // shuffle-free — an Exchange between the profcounts scan and the
    // full-outer SortMergeJoin would mean the whole standing
    // vocabulary reshuffles per ingest batch
    val scanIdx = p.indexOf("spark_catalog.default.graft_profcounts")
    assert(scanIdx >= 0, s"q142 does not read the written counts index:\n$p")
    val joinIdx = p.lastIndexOf("SortMergeJoin", scanIdx)
    assert(joinIdx >= 0, s"q142 counts merge is not a sort-merge join:\n$p")
    assert(!p.substring(joinIdx, scanIdx).contains("Exchange hashpartitioning"),
      s"q142 reshuffles the bucketed counts index:\n$p")
    // the merged counts feed distincts AND top-k through one shared
    // exchange, exactly as in q140 — the full-outer merge itself must
    // execute exactly once per ingest batch
    assert(p.contains("ReusedExchange"), s"q142 lost merge-exchange reuse:\n$p")
    assert(countOf(p, "SortMergeJoin") == 1,
      s"q142 rebuilds the counts merge more than once:\n$p")
  }

  test("q145: delete maintenance keeps the q142 merge shape — one SMJ, index side exchange-free") {
    val p = plan("q145_profile_delete")
    val scanIdx = p.indexOf("spark_catalog.default.graft_profcounts")
    assert(scanIdx >= 0, s"q145 does not read the written counts index:\n$p")
    val joinIdx = p.lastIndexOf("SortMergeJoin", scanIdx)
    assert(joinIdx >= 0 &&
      !p.substring(joinIdx, scanIdx).contains("Exchange hashpartitioning"),
      s"q145 reshuffles the bucketed counts index:\n$p")
    assert(countOf(p, "SortMergeJoin") == 1,
      s"q145 rebuilds the counts merge more than once:\n$p")
    assert(p.contains("ReusedExchange"), s"q145 lost merge-exchange reuse:\n$p")
  }

  test("the profile doors' merge-on-aggregate read: three rollups ride ONE store exchange") {
    // q146/q148's read shape (their GATED plans only show the
    // materialized census table, so the read is pinned directly):
    // SUM(cnt) grouped on (cname, v) over the store view is the one
    // corpus-sized exchange; the value rollup, the distinct rollup
    // and the heavy-hitter window must all canonicalize onto it
    // (2 ReusedExchange) — the exchange-reuse regression class that
    // doubled the q140 melt in round 13
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val store = (1L to 400L).map(k =>
      (k, s"c${k % 3}", s"v${k % 40}", 1L)).toDF("k", "cname", "v", "cnt")
    val df = graft.operators.Pipeline.profSurfaceFromCounts(
      store.groupBy(col("cname"), col("v"))
        .agg(sum(col("cnt")).as("cnt")).filter(col("cnt") > 0))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(countOf(p, "ReusedExchange") >= 2,
      s"profile-door read lost store-exchange reuse:\n$p")
    assert(countOf(p, "WindowGroupLimit") >= 2,
      s"profile-door read lost rank pushdown:\n$p")
  }

  test("q143: below-envelope read is a broadcast anti join; above-envelope read is join-free") {
    plan("q143_mass_takedown") // drives both delete events
    // the tombstoned artifact reads through a BROADCAST LeftAnti —
    // never a shuffled SMJ (that degradation is exactly what the
    // envelope exists to prevent)
    val tomb = spark.table(graft.sources.Layout.tableName(sfDir, "mgtombdel"))
    tomb.collect()
    val pt = tomb.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pt.contains("BroadcastHashJoin") && pt.contains("LeftAnti"),
      s"q143 tombstone read is not a broadcast anti join:\n$pt")
    assert(!pt.contains("SortMergeJoin"),
      s"q143 tombstone read shuffled its anti join:\n$pt")
    // the mass-takedown artifact was MATERIALIZED: its read carries no
    // join machinery at all — the O(survivors) write bought back every
    // read
    val mass = spark.table(graft.sources.Layout.tableName(sfDir, "mgmassdel"))
    mass.collect()
    val pm = mass.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!pm.contains("Join"), s"q143 mass-takedown read still joins:\n$pm")
  }

  test("hot aggregation paths stay inside whole-stage codegen") {
    // q01/q02 are pure scan->filter->agg: everything except the final
    // exchange should be codegen'd — the final plan marks codegen
    // stages with `*(n)` prefixes
    Seq("q01_delay_avg", "q02_late_pct").foreach { q =>
      val p = plan(q)
      assert(countOf(p, "\\*\\(\\d+\\)") >= 2, s"$q lost codegen: $p")
    }
  }
}
