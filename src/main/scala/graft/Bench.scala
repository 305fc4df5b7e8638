package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY: optional comma-separated name filter for quick
    // single-query timing during development.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Warmup pass: JVM/JIT + whole-stage-codegen compilation dominate
    // first-execution wall time at these scales (a 0.9 s query reads
    // 5.4 s cold). One untimed pass first, so the timed pass measures
    // steady-state engine throughput. Disable with SPARK_GRAFT_WARMUP=0.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      selected.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // Median-of-N timed passes (default 3, SPARK_GRAFT_PASSES to
    // override): single-pass numbers on this host drift ±10-25% with
    // load — larger than most real per-query deltas — so a regression
    // call on one pass is noise. Per-query median + total = Σ(medians)
    // makes round-over-round comparison signal. A failed execution
    // records -1.0; with a majority of good passes the median still
    // reports a genuine time, while a consistently failing query stays
    // pinned at -1 and never masquerades as fast.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt)
    val names = selected.keys.toVector
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
    // 3-decimal times: Double.toString of a 17-digit nanoTime ratio made
    // the 71-query line ~3.3 KB — longer than the driver's captured
    // stdout tail, so rounds 1-3 all recorded parsed:null. rint/1000
    // then Double.toString (shortest-repr, locale-independent) keeps the
    // full line under ~2 KB.
    def f3(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Two lines, most informative LAST: a line-wise tail parse (the
    // only kind that can work — sbt's "[info] running" line is on
    // stdout too) scanning from the end finds the complete FULL object
    // including per-query times (~2 KB after the 3-decimal rounding —
    // fits the driver's observed ~2.8 KB tail buffer). If the query
    // set ever grows the full line past the buffer, the SHORT line is
    // printed last instead — and each line says which form it is via
    // "queries_inline", so the consumer KNOWS when it parsed the
    // degraded no-per-query form rather than inferring from absence.
    def line(withQueries: Boolean): String = {
      val qpart = if (withQueries) s""","queries":$qs""" else ""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":$passes""" +
        s""","queries_inline":$withQueries$qpart,"sf":"$sfDir"}"""
    }
    val (full, short) = (line(true), line(false))
    if (full.length <= 2400) { println(short); println(full) }
    else { println(full); println(short) }
    spark.stop()
  }
}
