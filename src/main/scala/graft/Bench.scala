package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Skew-cap tripwire: the caps never fire on well-behaved corpora,
    // so a non-zero caps_fired in the report means some query produced
    // a CAPPED (oracle-divergent) result this run — the explicit
    // signal the oracle gate needs instead of a hash mismatch.
    val caps = CapTripwire.install(spark)
    // SPARK_GRAFT_ONLY: optional comma-separated name filter for quick
    // single-query timing during development.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val doWarmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    // Setup pass, timed separately: materialize the session-shared
    // intermediates (pair graph, corpus band index, bucketed +
    // partitioned layouts) BEFORE any timed pass — and regardless of
    // the SPARK_GRAFT_ONLY filter — so the one-time build cost is
    // reported as its own `setup_sec` field instead of being absorbed
    // by whichever dedup/layout-family query happens to execute first
    // in a given run order. This is what makes per-query medians
    // comparable between the builder's run order and the driver's.
    // Each shared-state build timed INDIVIDUALLY (round-9 verdict
    // finding #2: setup_sec more than doubled as one unattributed lump
    // when the nngraph build joined it — per-entry timings make the
    // next such jump attributable from the artifact alone).
    // Round-16: the pass runs PARALLEL lanes
    // (Similarity.warmAllParallel) — setup_sec is the WALL of the
    // whole pass (what the run actually pays), while setup_tables
    // keeps per-artifact spans, which now OVERLAP (their sum exceeds
    // the wall by design).
    val extraBuilds: Seq[(String, (org.apache.spark.sql.SparkSession, String) => Any)] = Seq(
      "multimodal_shared" -> ((s, d) => {
        graft.operators.Multimodal.ppmFeatTable(s, d).count()
        graft.operators.Multimodal.wavFeatTable(s, d).count()
        graft.operators.Multimodal.y4mFeatTable(s, d).count()
      }),
      "bucketed_lineitem_orders" -> ((s, d) => graft.sources.Layout.bucketedLineitemOrders(s, d)),
      "partitioned_events" -> ((s, d) => graft.sources.Layout.partitionedEvents(s, d)),
      "incremental_events" -> ((s, d) => graft.sources.Layout.incrementalEvents(s, d)),
      "bucketed_incremental" -> ((s, d) => graft.sources.Layout.bucketedIncremental(s, d)))
    val tSetup0 = System.nanoTime()
    val setupTables: Seq[(String, Double)] = if (!doWarmup) Nil else
      graft.operators.Similarity.warmAllParallel(spark, sfDir,
        dedupToo = true, extras = extraBuilds)
    val setupSec = (System.nanoTime() - tSetup0) / 1e9
    setupTables.foreach { case (n, t) =>
      System.err.println(s"[bench] setup $n: ${BenchReport.f3(t)} s")
    }
    // Warmup pass: JVM/JIT + whole-stage-codegen compilation dominate
    // first-execution wall time at these scales (a 0.9 s query reads
    // 5.4 s cold). One untimed pass first, so the timed pass measures
    // steady-state engine throughput. Disable with SPARK_GRAFT_WARMUP=0.
    if (doWarmup) {
      selected.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // Median-of-N timed passes (default 5 since round 10 — the round-9
    // verdict proved 3-pass medians of sub-0.5 s queries are noise-
    // dominated at ±30%; SPARK_GRAFT_PASSES to override): single-pass
    // numbers on this host drift ±10-25% with load — larger than most
    // real per-query deltas — so a regression call on one pass is
    // noise. Per-query median + total = Σ(medians) makes round-over-
    // round comparison signal, and the per-query [min, max] band of
    // the successful passes is published as queries_lo/queries_hi so
    // the diff tool can tell a real shift from the run's own measured
    // noise. A failed execution records -1.0; with a majority of good
    // passes the median still reports a genuine time, while a
    // consistently failing query stays pinned at -1 and never
    // masquerades as fast.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt)
    // SORTED, not Map-iteration order: hash order silently reshuffles
    // whenever the query set grows, so each round's per-query numbers
    // carried a different neighbor-effect lottery (GC/broadcast-
    // cleanup tails land on whoever runs next). A fixed total order
    // makes round-over-round medians measure the query, not the
    // year's Map layout. (Round-9 q38 diagnosis — see BASELINE.md.)
    val names = selected.keys.toVector.sorted
    val samples = (1 to passes).flatMap { _ =>
      names.map { name =>
        // Broadcast/shuffle state from prior queries is reclaimed by the
        // ContextCleaner only when a GC notices the weak refs; without an
        // explicit collection here, random queries absorb multi-second
        // cleaner+GC pauses mid-measurement (observed 0.4 s -> 3 s swings
        // in 41-query runs). One forced GC between queries makes the
        // per-query numbers measure the query, not the previous tenant.
        System.gc()
        val t0 = System.nanoTime()
        val ok = try { selected(name)(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val results = names.map { n =>
      val v = samples.collect { case (`n`, t) => t }.sorted
      n -> v((v.length - 1) / 2) // lower median: never averages two passes
    }
    // measured noise band per query: [min, max] over SUCCESSFUL passes
    val spread: Map[String, (Double, Double)] = names.flatMap { n =>
      val ok = samples.collect { case (`n`, t) if t >= 0 => t }
      if (ok.isEmpty) None else Some(n -> (ok.min, ok.max))
    }.toMap
    val capsFired = caps.drain(spark)
    capsFired.foreach(c => System.err.println(s"[bench] skew cap fired: $c"))
    // Line order + length budget live in BenchReport (unit-tested in
    // BenchTailSpec): the LAST line is always a complete JSON object
    // under the driver's measured ~2,000-char stdout tail buffer.
    val lines = BenchReport.lines(results, passes, sfDir, setupSec, capsFired.length.toLong)
    lines.foreach(println)
    // The driver's ~2,000-char stdout tail can no longer hold the full
    // per-query map at this query count, so the per-query medians are
    // ALSO written as a file artifact — the versioned data source for
    // round-over-round per-query diffs (committed as BENCHTABLE_r{N}
    // .json; BASELINE.md's table is generated from it).
    // The file artifact additionally carries the control query's time
    // and control-normalized per-query ratios (BenchReport.tableJson)
    // so cross-round diffs can cancel uniform host drift.
    val tablePath = sys.env.getOrElse("SPARK_GRAFT_BENCHTABLE", "BENCHTABLE_latest.json")
    if (tablePath.nonEmpty) {
      val p = java.nio.file.Paths.get(tablePath).toAbsolutePath
      java.nio.file.Files.writeString(p,
        BenchReport.tableJson(results, passes, sfDir, setupSec,
          capsFired.length.toLong, spread, setupTables) + "\n")
      // cwd-relative default: make the artifact discoverable whatever
      // directory the bench ran from (round-7 advice)
      System.err.println(s"[bench] wrote per-query table artifact: $p")
    }
    spark.stop()
  }
}
