package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-9 item 6: ONE sf1-class bench point for the headline queries
  * (q01 agg, q15 window, q21 LSH, q78 span, q83 indexed ANN, q87
  * bigram LM, q96 recall harness) — the per-round sf0.1 bench cannot
  * catch a plan that flips to a broadcast/cartesian shape only past a
  * size threshold (AQE thresholds are absolute bytes, not fractions).
  *
  * Builds a k=10 replica of the sf0.1 snapshot (~6M lineitem rows /
  * 50k documents / 20k embeddings) as plain parquet under /tmp —
  * /root/testdata is read-only — with the scale-probe replication
  * discipline: fact keys offset per replica; every document token
  * suffixed `_i` so replicas share no shingle/window universe (a
  * replicated-verbatim corpus would manufacture a quadratic
  * cross-replica pair graph no real corpus has); embeddings replicated
  * with offset ids (the ANN corpus grows 10×, and the SNAPSHOT-
  * ADAPTIVE quantizer sizes itself K = 625 = clamp(20000/32) — this
  * run exercises the round-9 adaptive-capacity path for real, beyond
  * the 64-floor both oracle scales sit at).
  *
  * Reports per-query seconds (median of `SPARK_GRAFT_PASSES`, default
  * 2) plus PLAN PINS from the AQE-final executed plans:
  *
  *  - NO BroadcastNestedLoopJoin / CartesianProduct anywhere (the
  *    flip this run exists to catch) — a violation FAILS the run;
  *  - q83's SelectedBucketsCount line recorded verbatim (bucket
  *    pruning still planning-time at the larger size);
  *  - join strategy node names per query recorded.
  *
  * One JSON line on stdout; committed per round as SF1BENCH_r{N}.json
  * (BASELINE.md carries the sf0.1-vs-sf1 scaling table). Not part of
  * the driver's bench contract — run manually:
  * `sbt "runMain graft.Sf1Bench"`. */
object Sf1Bench {

  private val Headline = Vector(
    "q01_delay_avg", "q15_window_rank", "q21_minhash_lsh", "q78_span_overlap",
    "q83_ann_ivf_indexed", "q87_bigram_lm", "q96_ann_recall", "q107_graph_ann",
    // round-12 item 5: one delete-family census at the sf1 point — the
    // lifecycle claim (maintained == rebuild, O(affected) cone) gated
    // at production takedown density beyond the per-round scales
    "q123_ann_delete_sparse",
    // round-15 item 1: the MVCC-lifecycle + ANALYZE families above
    // the quantizer floor — the newest, most scale-sensitive
    // machinery (broadcast envelopes, merge-on-read debt, min/max
    // re-scan decisions) previously had no above-floor correctness
    // point. q131 interleaves append→delete→re-add→append→compact on
    // one store; q140/q142/q145 gate the profile and its maintenance
    // under ingest AND delete; q143 walks the tombstone-vs-
    // materialize envelope from both sides at 10× tombstone mass.
    "q131_ann_lifecycle", "q140_corpus_profile", "q142_profile_update",
    "q145_profile_delete", "q143_mass_takedown",
    // ... and the remaining lifecycle VERBS, so every verb family has
    // an sf1 point: q132 upsert (held chain — the reversed-route
    // correction recomputed from raw embeddings), q136 time travel +
    // CDC (same held chain, EXCEPT diffs), q133 the compaction-policy
    // DECISION (full oracle — nothing trained, 2.9 s at k=10)
    "q132_ann_upsert", "q136_time_travel", "q133_compaction_policy",
    // ... and the round-15 additions, all raw-derivable oracles
    // (each sub-second at k=10): q147 rebucketing layout decisions at
    // the larger store, q148 the profile door × takedown composition
    // (run at the production-ratio door envelope since round 16, so
    // the chunked-delta path EXECUTES here — chunk_splits in the JSON
    // line — where it no-ops at the oracle scales), q149 the real WAV
    // decode census over the 50k-blob corpus, q150 the cross-store
    // savepoint isolation
    "q147_bucket_evolution", "q148_profile_takedown_door",
    "q149_wav_neardup", "q150_savepoint", "q151_jsonl_gz_roundtrip",
    // ... and the round-16 additions, all raw-derivable oracles:
    // q152 savepoints in the retention horizon (the pin-crossing
    // compaction at the 10× store), q153 the real y4m video decode
    // census over the 50k-clip corpus, q154 the zstd interchange,
    // q155 the training mix off two pinned stores (the frozen
    // bucketed join's zero-exchange decision held at the larger size)
    "q152_savepoint_horizon", "q153_y4m_neardup", "q154_jsonl_zst_roundtrip",
    "q155_savepoint_training_mix",
    // ... and the round-16 training-reader additions, raw-derivable
    // oracles: q156 the deterministic epoch shuffle (order checksums
    // + the one-exchange/one-scan plan facts held at 50k docs), q157
    // the constraint suite (single-pass decisions at the 10× corpus,
    // RI over the 6M-row lineitem), q158 the inverted index (bucket-
    // pruned point lookups over the 310-term replicated vocabulary)
    "q156_epoch_shuffle", "q157_quality_constraints", "q158_inverted_index",
    // q159 the physical shard export (file-per-shard + frame magic
    // decisions held over the 50k-doc corpus), q160 the mergeable
    // quantile sketch (maintenance decisions + rank bounds at 10×),
    // q161 the temperature mix (hash-threshold sample at 10×)
    "q159_shard_export", "q160_quantile_sketch", "q161_temperature_mix",
    // q162 the quantile-sketch door — the second REAL stream at the
    // sf1 point (chunked-delta path shared with q146/q148), q163 the
    // pinned export (point-in-time delivery off a frozen pin at 10×)
    "q162_stream_quantile_door", "q163_pinned_export",
    // q164/q165 the delivery-layer lifecycle (append-only deltas,
    // fold-on-policy with atomic dir swap) at the 50k-doc corpus
    "q164_delta_export", "q165_export_compaction",
    // q166 the DataSourceV2 loader connector (pushdown decisions at
    // the 50k-doc layout), q167 statistics-only aggregate pushdown
    // (zero-data-file stats held at 10×)
    "q166_shard_connector", "q167_stats_pushdown",
    // ... and the round-17 delivery-layer additions: q168 the manifest
    // lifecycle (export → stats → delta → stats → fold → stats, every
    // stats read zero-data-file at the 50k-doc layout), q169 the
    // key-grouped zero-exchange census through the connector, q170
    // the streaming tail consumer (doc-keyed re-delivery absorption
    // at the 10× corpus, chunked under the production-ratio envelope)
    "q168_manifest_lifecycle", "q169_shard_key_grouped",
    "q170_stream_shard_tail",
    // q171 the storage-partitioned join (zero-exchange two-scan join
    // at the 10x layout), q172 the delivery-layer takedown (tombstone
    // deltas, O(affected) accounting, fold materialization)
    "q171_shard_partitioned_join", "q172_delivery_takedown",
    // q173 snapshot isolation (orphan invisibility + intact-snapshot
    // stats at the 10x layout)
    "q173_snapshot_isolation",
    // ... and the round-18 delivery-layer additions: q174 versioned
    // overwrites (time-travel census of the retained generation +
    // exact vacuum at the 10× layout), q175 the vacuum/repair verbs
    // (broken-snapshot refusal → rescan rebuild → orphan sweep), q176
    // evolve-on-append (name-union widening, old-era NULLs, nullable
    // COUNTs metadata-only off the merged null counts)
    "q174_versioned_overwrite", "q175_vacuum_repair", "q176_evolve_append",
    // q177 the generation diff (incremental batch read between
    // commits — O(new files) at the 10× layout), q178 the layout
    // history (DESCRIBE HISTORY re-derived from residues at 10×)
    "q177_generation_diff", "q178_layout_history",
    // q179 the copy-on-write upsert (image-shard rewrite + auditable
    // original via time travel at the 10× layout)
    "q179_delivery_upsert",
    // q180 the OPTIMIZE verb (metadata-only policy, fold, expire — the
    // nightly maintenance job at the 10× layout)
    "q180_layout_maintenance",
    // ... and the round-19 delivery-layer additions, raw-derivable
    // oracles: q181 per-file zone maps (point read opens ONE file of
    // the 4-era 10× layout; range scan opens the era image), q182 the
    // streaming WRITE (epoch commits + empty-drain silence + ledger
    // idempotence, both stream directions through one connector),
    // q183 the SQL catalog (VERSION AS OF == asOfGen with zero plan
    // change, stats pushdown through the catalog route)
    "q181_file_skipping", "q182_stream_write", "q183_sql_catalog",
    // ... and the continued-session round-19 additions: q184 the
    // connector-owned write clustering (one sorted file per shard per
    // commit from a key-less 13-partition input at 10×), q185 scan
    // statistics driving join selection (the pruned layout read
    // broadcasts into a 2.1M-row fact join), q186 rollback + tags
    // (restore-as-new-commit, tag as vacuum GC root at the 10× layout)
    "q184_clustered_write", "q185_scan_stats", "q186_rollback_refs",
    // q187 the throttled drain (admission control: ceil(files/cap)
    // epoch commits at the 10× layout, census exact), q188 runtime
    // file pruning (the doc_id join's build side confines the scan
    // to exactly the covering era files at the 10× layout)
    "q187_throttled_drain", "q188_runtime_pruning",
    // q189 bounded file sizes (the writer rolls at targetFileBytes;
    // disjoint sorted zone maps keep point I/O at one file at 10×),
    // q190 bounded maintenance (OPTIMIZE with a roll budget re-lands
    // monoliths as rolled files at 10×; the budget policy idempotent)
    "q189_bounded_files", "q190_bounded_maintenance")

  private val Offset = 100000000L

  /** Round-17 item 4 (round-16 judge): the HOST-SATURATION probe as a
    * machine-made JSON field instead of a by-hand shell loop. Measures
    * single-thread MD5 throughput, then 32-way total throughput;
    * `effective_cores` = the ratio — ~22 on a healthy round-16 machine,
    * well below the adjudication threshold on a throughput-degraded
    * host. Runs BEFORE any Spark work so the probe measures the
    * machine, not this process's own load. */
  private def effectiveCores(threads: Int = 32): Double = {
    val buf = Array.tabulate[Byte](1 << 16)(i => (i * 31).toByte)
    def rate(nThreads: Int, millis: Long): Double = {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val counts = new java.util.concurrent.atomic.AtomicLong()
      val ts = (1 to nThreads).map { _ =>
        new Thread(() => {
          val md = java.security.MessageDigest.getInstance("MD5")
          var local = 0L
          while (!stop.get()) { md.update(buf); md.digest(); local += 1 }
          counts.addAndGet(local); ()
        })
      }
      ts.foreach(_.start())
      Thread.sleep(millis)
      stop.set(true)
      ts.foreach(_.join())
      counts.get().toDouble / (millis / 1000.0)
    }
    rate(1, 300) // JIT warmup, discarded
    val single = rate(1, 1000)
    val total = rate(threads, 1000)
    if (single <= 0) 0.0 else total / single
  }

  /** Replicate the sf0.1 snapshot k× into `out` (idempotent via a
    * _SUCCESS marker). Dims copy verbatim; facts offset their keys;
    * documents additionally suffix every token per replica. */
  private def buildSnapshot(s: SparkSession, src: String, out: String, k: Int): Unit = {
    val done = new java.io.File(s"$out/_GRAFT_SF1_DONE")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    def rep(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => f(base, i)).reduce(_ union _)

    Seq("region", "nation", "customer", "supplier", "part").foreach { d =>
      write(s.read.parquet(s"$src/$d.parquet"), d)
    }
    write(rep(s.read.parquet(s"$src/orders.parquet")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Offset))
    }, "orders")
    write(rep(s.read.parquet(s"$src/lineitem.parquet")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Offset))
    }, "lineitem")
    write(rep(s.read.parquet(s"$src/events.parquet")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * Offset))
    }, "events")
    write(rep(s.read.parquet(s"$src/documents.parquet")) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * Offset))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "), t => concat(t, lit(s"_$i")))))
    }, "documents")
    // Replicated embeddings are PERTURBED (round 10): verbatim clones
    // made every probe's exact top-5 its own copies, so both ANN
    // methods scored recall 1.0 — a degenerate measurement (the r10
    // verdict-honesty note). Each replica keeps ~2/3 of its dims and
    // flips the rest to deterministic hash-derived values in the
    // corpus's own value range — clusters of 10 correlated-but-
    // distinct vectors, so sf1 recall measures real retrieval
    // structure while the snapshot stays fully deterministic (both
    // engines recompute from the same parquet, so the hash gate is
    // unaffected).
    write(rep(s.read.parquet(s"$src/embeddings.parquet")) { (df, i) =>
      val v = df.withColumn("vec_id", col("vec_id") + lit(i * Offset))
      if (i == 0) v else v.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          when(pmod(hash(col("vec_id"), lit(i), j), lit(3)) === 0,
            ((pmod(hash(col("vec_id"), j), lit(601)) - lit(300))
              .cast("double") / lit(1000.0)).cast("float"))
            .otherwise(x)))
    }, "embeddings")
    done.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val k = sys.env.getOrElse("SPARK_GRAFT_SF1_K", "10").toInt
    // dir name carries the snapshot recipe generation (p1 = perturbed
    // replica embeddings) so a stale pre-perturbation snapshot's
    // _DONE marker can never satisfy the idempotence check
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", s"/tmp/graft_sf1_k${k}_p1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // host saturation BEFORE the session exists (nothing else running)
    val effCores = effectiveCores()
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // round-16 item 3 (round-15 judge): run the stream doors at a
    // PRODUCTION-RATIO upsert envelope so the chunked-delta path
    // actually EXECUTES at the sf1 point (measured per-batch
    // vocabulary deltas are ~5-6k rows at k=10 — 2.5k docs/micro-batch
    // × (doc_id + text + small-cardinality columns); 2048 forces ~3
    // chunks per event, where the oracle scales' ~300-row deltas
    // no-op). The q148 hash gate is chunking-invariant by
    // construction — the JSON line records how many splits fired, and
    // a require below makes a silently-unexercised chunk path FAIL
    // the run rather than ship a vacuous gate.
    spark.conf.set("spark.graft.door.chunkEnv", "2048")

    val tBuild0 = System.nanoTime()
    buildSnapshot(spark, src, out, k)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    // one-time shared-state build (written pair graph / band & window
    // indexes / ANN index tables) — its own field, the Bench
    // convention. Round-16 item 5: PARALLEL lanes
    // (Similarity.warmAllParallel) — setup_sec is the pass WALL; the
    // per-artifact spans (overlapping by design) ride the JSON line.
    val tSetup0 = System.nanoTime()
    val setupTables =
      graft.operators.Similarity.warmAllParallel(spark, out, dedupToo = true)
    val setupSec = (System.nanoTime() - tSetup0) / 1e9

    val selected = Headline.map(n => n -> SparkEntry.queries(n))
    // warmup pass (JIT + codegen), then timed passes
    selected.foreach { case (_, fn) => fn(spark, out).count() }
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val samples = (1 to passes).flatMap { _ =>
      selected.map { case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, out).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val times = Headline.map { n =>
      val v = samples.collect { case (`n`, t) => t }.sorted
      n -> v((v.length - 1) / 2)
    }

    // PLAN-FLIP pin: per query, the count of nested-loop join nodes in
    // the AQE-final executed plan at sf1 must not EXCEED the sf0.1
    // count — several queries legitimately carry a bounded broadcast
    // NLJ by design (q96's crossJoin of a 1-row count; the exact
    // baseline's non-equi probe broadcast), so "zero NLJ" is the wrong
    // assertion; "no NEW nested-loop shape appears with size" is the
    // flip this run exists to catch.
    def planOf(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               dir: String): String = {
      val df = fn(spark, dir)
      df.count()
      df.queryExecution.executedPlan.toString
    }
    def nljCount(p: String): Int =
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .map(m => p.sliding(m.length).count(_ == m)).sum
    val plans = selected.map { case (name, fn) => name -> planOf(fn, out) }.toMap
    val basePlans = selected.map { case (name, fn) => name -> planOf(fn, src) }.toMap
    val flips = Headline.filter(n => nljCount(plans(n)) > nljCount(basePlans(n)))
    def joinsOf(p: String): Seq[String] =
      Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct").filter(p.contains)
    val bucketLine = plans("q83_ann_ivf_indexed").linesIterator
      .find(_.contains("SelectedBucketsCount"))
      .map(_.trim.replaceAll(".*SelectedBucketsCount", "SelectedBucketsCount"))
      .getOrElse("ABSENT")

    // PRODUCTION-REGIME pruning point (round-10, verdict finding #3):
    // the q83 gate's MaxProbes-probe union covers every bucket
    // ("8 out of 8" above), so it cannot demonstrate pruning. One
    // external point query at nprobe=2 — ≤ 2 cell literals — must
    // provably skip buckets at the sf1 size.
    val pointPlan = planOf((sp, d) =>
      graft.operators.Similarity.ivfPointQuery(sp, d, 2), out)
    val pointLine = pointPlan.linesIterator
      .find(_.contains("SelectedBucketsCount"))
      .map(_.trim.replaceAll(".*SelectedBucketsCount", "SelectedBucketsCount"))
      .getOrElse("ABSENT")
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(pointLine)
      .exists(m => m.group(1).toInt < m.group(2).toInt)
    require(prunes,
      s"production-regime point query does not prune buckets at sf1: $pointLine")

    // round-13 item 5: the merge-on-read KNEE at the sf1 point —
    // q123's delete view read (broadcast anti join + union over the
    // untouched base), then q130's compaction, then the recovered
    // (join-free bucketed table) read. Runs AFTER all timed passes and
    // plan captures so the stable-name swap cannot contaminate q123's
    // merge-on-read medians; the verify dump below reads the compacted
    // artifact, which is row-identical by the q130 gate.
    val delName = graft.sources.Layout.tableName(out, "nngraphdelsparse")
    val tView0 = System.nanoTime()
    spark.table(delName).count()
    val delViewReadSec = (System.nanoTime() - tView0) / 1e9
    val tComp0 = System.nanoTime()
    graft.operators.Similarity.sparseDeleteCompaction(spark, out).count()
    val compactSec = (System.nanoTime() - tComp0) / 1e9
    val tRead0 = System.nanoTime()
    spark.table(delName).count()
    val compactedReadSec = (System.nanoTime() - tRead0) / 1e9

    // sf1 CORRECTNESS dump (round-10 item 5): the headline queries'
    // results + their oracle SQL in the Verify layout, so
    // `python3 tools/check.py <sf1_dir> <sf1_dir>/verify` hash-gates
    // the same queries the wall-clock point measures — correctness
    // above the quantizer floor, not just plan shape.
    //
    // Round-12 item 7 (round-11 advice): the dump is a SORTED
    // DISTRIBUTED write — each query ends in a global ORDER BY, so
    // the write's range-partitioned part files carry disjoint,
    // ordered key ranges and part-file NAME order (zero-padded
    // partition ids) IS the global row order; check.py's
    // sorted-glob + concat read re-assembles exactly the query's
    // ORDER BY. Nothing materializes on the driver — the round-11
    // form collect()ed up to 3.98M Row objects (q15), a driver-heap
    // ceiling the harness has no business having.
    val vDir = s"$out/verify"
    new java.io.File(vDir).mkdirs()
    // round-15 item 2: q15's sf1 gate is a CENSUS — per-rank counts +
    // an order-independent checksum over (keys, integer cents, rank)
    // on BOTH engines — instead of the raw 3.98M-row dump whose
    // DuckDB ORDER BY + hash was 19.9 s of the 41.3 s round-14 oracle
    // wall (and whose dump dominated the verify I/O). sf0.1 keeps the
    // full row gate, so nothing weakens at the oracle scales. Price
    // strings never enter the hash: cents = round(price·100) is
    // integer-exact on both engines (the values are ~1e-12 from an
    // integer, so any rounding mode agrees).
    def q15Census(df: DataFrame): DataFrame = df
      .groupBy(col("rnk"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(graft.functions.Fns.hash32(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"),
          round(col("price") * 100).cast("long"), col("rnk")))), lit(0L))
          .as("checksum"))
      .select(col("rnk"), col("n_rows"), col("checksum"))
      .orderBy("rnk")
    selected.foreach { case (name, fn) =>
      val res = if (name == "q15_window_rank") q15Census(fn(spark, out))
                else fn(spark, out)
      res.write.mode("overwrite").parquet(s"$vDir/$name")
    }
    // round-17: staged temp table (the q123 trick) — byte-identical
    // census, 2.8 → 1.5 s oracle wall at k=10
    val q15CensusSql =
      """CREATE OR REPLACE TEMP TABLE q15h_t AS
        |  SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
        |         CAST(row_number() OVER (PARTITION BY l_orderkey
        |              ORDER BY l_extendedprice DESC, l_linenumber,
        |                       l_partkey, l_suppkey, l_quantity) AS INT) AS rnk
        |  FROM lineitem;
        |SELECT rnk, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(coalesce(sum(CAST('0x' || substr(md5(
        |         CAST(l_orderkey AS VARCHAR) || '|' ||
        |         CAST(l_linenumber AS VARCHAR) || '|' ||
        |         CAST(CAST(round(price * 100) AS BIGINT) AS VARCHAR) || '|' ||
        |         CAST(rnk AS VARCHAR)), 1, 8) AS BIGINT)), 0) AS BIGINT) AS checksum
        |FROM q15h_t WHERE rnk <= 3 GROUP BY rnk ORDER BY rnk""".stripMargin
    // the written ground-truth artifact, dumped NEXT TO the snapshot
    // tables so the q96 oracle can READ it instead of re-deriving the
    // probes×corpus exact scan (round-10 verdict finding #3: the
    // re-derived CTE needed ~50 GB of DuckDB temp at sf1); check.py
    // registers every extra <name>.parquet it finds in the sf dir
    graft.operators.Similarity.exactTopKTable(spark, out)
      .write.mode("overwrite").parquet(s"$out/exacttopk.parquet")
    // round-12 item 5: the held graph + routing artifacts back the
    // sf1 q123 oracle (annDeleteSparseHeldSql) the same way
    spark.table(graft.sources.Layout.tableName(out, "nngraph"))
      .write.mode("overwrite").parquet(s"$out/nngraph.parquet")
    graft.operators.Similarity.nnRoutesDump(spark, out)
      .write.mode("overwrite").parquet(s"$out/nnroutes.parquet")
    // round-13 item 7: the quantizer + code tables back the held
    // q83/q96/q107 oracles — re-deriving the corpus×K assignment and
    // the two full-corpus PQ encodes in DuckDB dominated the sf1
    // oracle wall (q96 1,207 s + q107 721 s at K=625)
    Seq("ivfcents", "pqcodes", "ivfpq").foreach { t =>
      spark.table(graft.sources.Layout.tableName(out, t))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // ... and the trained codebooks themselves: profiling showed the
    // held q96 wall was almost entirely the two re-trained Lloyd
    // chains (sample × subs × codes assignment windows), not the
    // encodes
    graft.operators.Similarity.cbDump(spark, out)
      .write.mode("overwrite").parquet(s"$out/pqcb.parquet")
    graft.operators.Similarity.rcbDump(spark, out)
      .write.mode("overwrite").parquet(s"$out/pqrcb.parquet")
    // round-15 item 1: the held-quantizer route of every embedding
    // backs the held q131 oracle (annLifecycleHeldSql) — the
    // membership algebra stays fully re-derived; only the K=625
    // training + 200k×625 routing cross join is held
    graft.operators.Similarity.lifeAssignDump(spark, out)
      .write.mode("overwrite").parquet(s"$out/lifeassign.parquet")
    // ... and the BASE centroids the held q132/q136 reversed-route
    // recomputation scores against
    spark.table(graft.sources.Layout.tableName(out, "ivfcentsbase"))
      .write.mode("overwrite").parquet(s"$out/ivfcentsbase.parquet")
    // round-11 advice: the artifact-backed q96 gate is self-referential
    // at sf1 (the oracle reads the exacttopk table the same Spark job
    // wrote). Spot-check: re-derive the exact top-5 for a SMALL probe
    // subsample from raw embeddings in DuckDB and hash-compare the
    // artifact's rows for those probes — an exactTopKTable bug now
    // fails the sf1 gate independently of the artifact.
    val spotProbes = 16
    val etkSpot = graft.operators.Similarity.exactTopKTable(spark, out)
    val firstProbes = etkSpot.select(col("probe_id")).distinct()
      .orderBy(col("probe_id")).limit(spotProbes)
    etkSpot.join(firstProbes, Seq("probe_id"), "left_semi")
      .select(col("probe_id"), col("vec_id"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
      .write.mode("overwrite").parquet(s"$vDir/q96_exact_spotcheck")
    val spotSql =
      s"""WITH q AS (SELECT vec_id, ${graft.operators.Similarity.qListSql} AS q FROM embeddings),
         |n AS (SELECT vec_id, q,
         |             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
         |      FROM q
         |      WHERE list_sum(list_transform(q, x -> x * x)) > 0),
         |pset AS (SELECT vec_id FROM n WHERE vec_id % 100 = 0
         |         ORDER BY vec_id LIMIT $spotProbes),
         |sc AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |         CAST(CAST(list_inner_product(p.q, c.q) AS BIGINT) AS DOUBLE)
         |           / sqrt(CAST(p.qn AS DOUBLE) * CAST(c.qn AS DOUBLE)) AS cos
         |  FROM n p JOIN pset ON p.vec_id = pset.vec_id
         |  JOIN n c ON p.vec_id <> c.vec_id)
         |SELECT probe_id, vec_id, CAST(rnk AS INT) AS rnk FROM (
         |  SELECT probe_id, vec_id,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY cos DESC, vec_id) AS rnk
         |  FROM sc) t WHERE rnk <= 5
         |ORDER BY probe_id, rnk""".stripMargin
    // round-15 (round-14 advice #2): the held q83/q107 oracles verify
    // probe-side derivations against the engine's own dumped routing/
    // graph artifacts — so, mirroring q96_exact_spotcheck, two spot
    // checks re-derive a 16-probe slice INDEPENDENTLY of those dumps:
    //  - q83_route_spotcheck: the rank-1 centroid route recomputed
    //    from RAW embeddings against the dumped centroids must equal
    //    the nnroutes assignment the held oracles consume;
    //  - q107_graph_spotcheck: the stored graph edges' neighbor-norm
    //    payloads must equal norms recomputed from RAW embeddings (a
    //    fabricated or corrupted graph payload fails here even though
    //    the neighbor SELECTION is legitimately approximate).
    graft.operators.Similarity.nnRoutesDump(spark, out)
      .filter(col("r") === 1 && pmod(col("vec_id"), lit(100)) === 0)
      .orderBy(col("vec_id")).limit(spotProbes)
      .select(col("vec_id"), col("cent_id"))
      .write.mode("overwrite").parquet(s"$vDir/q83_route_spotcheck")
    val routeSpotSql =
      s"""WITH q AS (SELECT vec_id, ${graft.operators.Similarity.qListSql} AS q FROM embeddings),
         |n AS (SELECT vec_id, q,
         |             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
         |      FROM q
         |      WHERE list_sum(list_transform(q, x -> x * x)) > 0),
         |pset AS (SELECT vec_id FROM n WHERE vec_id % 100 = 0
         |         ORDER BY vec_id LIMIT $spotProbes),
         |cents AS (SELECT vec_id AS cent_id, q AS cq, qn AS cqn FROM ivfcents)
         |SELECT vec_id, cent_id FROM (
         |  SELECT v.vec_id, c.cent_id,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           CAST(CAST(list_inner_product(v.q, c.cq) AS BIGINT) AS DOUBLE)
         |             / sqrt(CAST(v.qn AS DOUBLE) * CAST(c.cqn AS DOUBLE)) DESC,
         |           c.cent_id) AS rn
         |  FROM n v JOIN pset ON v.vec_id = pset.vec_id
         |  CROSS JOIN cents c) t
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    val gTable = spark.table(graft.sources.Layout.tableName(out, "nngraph"))
    val gSpot = gTable.select(col("vec_id")).distinct()
      .filter(pmod(col("vec_id"), lit(100)) === 0)
      .orderBy(col("vec_id")).limit(spotProbes)
    gTable.join(gSpot, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("nbr"), col("nqn"))
      .orderBy(col("vec_id"), col("nbr"))
      .write.mode("overwrite").parquet(s"$vDir/q107_graph_spotcheck")
    val graphSpotSql =
      s"""WITH q AS (SELECT vec_id, ${graft.operators.Similarity.qListSql} AS q FROM embeddings),
         |n AS (SELECT vec_id,
         |             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
         |      FROM q
         |      WHERE list_sum(list_transform(q, x -> x * x)) > 0),
         |pset AS (SELECT DISTINCT vec_id FROM nngraph WHERE vec_id % 100 = 0
         |         ORDER BY vec_id LIMIT $spotProbes),
         |e AS (SELECT g.vec_id, g.nbr FROM nngraph g
         |      JOIN pset ON g.vec_id = pset.vec_id)
         |SELECT e.vec_id, e.nbr, CAST(x.qn AS BIGINT) AS nqn
         |FROM e JOIN n x ON x.vec_id = e.nbr
         |ORDER BY e.vec_id, e.nbr""".stripMargin
    val oracleFor = SparkEntry.oracleSql +
      ("q83_ann_ivf_indexed" -> graft.operators.Similarity.annIvfHeldSql) +
      ("q96_ann_recall" -> graft.operators.Similarity.annRecallHeldSql) +
      ("q107_graph_ann" -> graft.operators.Similarity.graphAnnHeldSql) +
      ("q123_ann_delete_sparse" ->
        graft.operators.Similarity.annDeleteSparseHeldSql) +
      ("q131_ann_lifecycle" ->
        graft.operators.Similarity.annLifecycleHeldSql) +
      ("q132_ann_upsert" ->
        graft.operators.Similarity.annUpsertHeldSql) +
      ("q136_time_travel" ->
        graft.operators.Similarity.annTimeTravelHeldSql) +
      ("q15_window_rank" -> q15CensusSql) +
      ("q96_exact_spotcheck" -> spotSql) +
      ("q83_route_spotcheck" -> routeSpotSql) +
      ("q107_graph_spotcheck" -> graphSpotSql)
    def jq(x: String): String = "\"" + x.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$vDir/oracle_sql.json"),
      (Headline ++ Seq("q96_exact_spotcheck", "q83_route_spotcheck",
        "q107_graph_spotcheck")).flatMap(n => oracleFor.get(n).map(sql =>
        s"${jq(n)}: ${jq(sql)}")).mkString("{", ",", "}"))

    // round-12 item 5: the sf1 point of the delete-cone trend (the
    // probe's 30.5% → 10.4% at sf0.01 → sf0.1) — |A2| stays
    // degree-bounded while the corpus grows
    val (coneA2, coneVerts) =
      graft.operators.Similarity.sparseDeleteConeStats(spark, out)

    // round-15 item 1: record which side of the massDeleteKeys
    // envelope each q143 event landed on at the 10× tombstone mass
    // (the census gates them against the oracle's CASE; the JSON line
    // makes the decision VISIBLE without opening the dump)
    val q143Decisions = spark
      .table(graft.sources.Layout.tableName(out, "masscensus"))
      .filter(col("artifact").startsWith("decision"))
      .select(col("artifact"), col("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val q = times.map { case (n, t) => s""""$n":${BenchReport.f3(t)}""" }.mkString(",")
    val j = plans.map { case (n, p) =>
      s""""$n":"${joinsOf(p).mkString("+")}"""" }.mkString(",")
    val setupMap = setupTables.map { case (n, t) =>
      s""""$n":${BenchReport.f3(t)}""" }.mkString(",")
    // the chunked door path must have EXECUTED at this scale point —
    // a 0 here means the envelope knob and the snapshot drifted apart
    // and the "chunking proven at sf1" claim would be vacuous
    require(graft.streaming.StreamDoor.chunkSplits.get() > 0,
      "stream-door chunking did not fire at the sf1 point — " +
        "per-batch deltas fell under spark.graft.door.chunkEnv")
    println(
      s"""{"metric":"sf1_total","value":${BenchReport.f3(times.map(_._2).sum)},"unit":"sec"""" +
        s""","k":$k,"build_sec":${BenchReport.f3(buildSec)},"setup_sec":${BenchReport.f3(setupSec)}""" +
        s""","effective_cores":${BenchReport.f3(effCores)}""" +
        s""","setup_lane_spans":{$setupMap}""" +
        s""","chunk_splits":${graft.streaming.StreamDoor.chunkSplits.get()}""" +
        s""","passes":$passes,"ivf_k":${graft.operators.Similarity.ivfK(spark, out)}""" +
        s""","queries":{$q},"joins":{$j},"q83_buckets":"$bucketLine"""" +
        s""","q83_point_nprobe2_buckets":"$pointLine"""" +
        s""","delete_cone_a2":$coneA2,"delete_cone_vertices":$coneVerts""" +
        s""","q143_below_tombstoned":${
          q143Decisions.getOrElse("decision_below_tombstoned", -1L)}""" +
        s""","q143_above_materialized":${
          q143Decisions.getOrElse("decision_above_materialized", -1L)}""" +
        s""","delete_cone_frac":${
          BenchReport.f3(coneA2.toDouble / math.max(1L, coneVerts))}""" +
        s""","delview_read_sec":${BenchReport.f3(delViewReadSec)}""" +
        s""","compact_sec":${BenchReport.f3(compactSec)}""" +
        s""","compacted_read_sec":${BenchReport.f3(compactedReadSec)}""" +
        s""","verify_dump":"$vDir"""" +
        s""","plan_flips":[${flips.map("\"" + _ + "\"").mkString(",")}]}""")
    require(flips.isEmpty,
      s"plan flipped to a nested-loop shape at sf1-class size: ${flips.mkString(", ")}")
    spark.stop()
  }
}
