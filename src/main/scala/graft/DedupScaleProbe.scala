package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Empirical scaling probe for the two exact-ish dedup pair shapes —
  * MinHash-LSH (q21) and stride-1 window-hash span overlap (q78):
  * replicates `documents` k× (k = 1, 2, 4, 8), with every token of
  * replica i suffixed `_i` so replicas share NO shingles/windows across
  * copies — the pair graph of the replicated corpus is k DISJOINT
  * per-replica graphs. (Each replica's borderline-threshold pairs
  * differ by hash draw — the suffix changes every hash — so the
  * TOTAL is only ≈k×; the per-replica structure is what's exact.)
  * Asserted per k and per shape:
  *
  *  - **isolation**: zero cross-replica pairs — banding / window
  *    equi-joins never invent candidates across disjoint universes;
  *  - **stability**: replica 0's subgraph is bit-identical at every k
  *    (adding corpus never perturbs existing pairs).
  *
  * Wall time per k is REPORTED (not asserted — host load makes a
  * timing require flaky): ~linear growth demonstrates candidate
  * generation stays bucket/df-bounded, where an all-pairs or
  * hot-bucket plan would grow quadratically. Measured on this host:
  * q21 k = 1/2/4/8 → 2.8/2.5/3.7/6.6 s (8× data → 2.4× wall);
  * q78 → 1.8/3.0/5.6/10.1 s (8× → 5.6× — near-linear, as expected
  * for a stride-1 window table that grows linearly with the corpus;
  * quadratic would be 64×).
  *
  * The per-DOC span taggers (q99 fraction, q101 trim) are probed the
  * same way with doc-shaped invariants: replica-0 rows bit-identical
  * at every k and total rows exactly k× the base. Measured:
  * q99 → 0.8/1.0/1.2/1.5 s (8× → 1.8×), q101 → 1.4/1.8/2.3/3.3 s
  * (8× → 2.3×) — the no-pair-join formulations scale like the scan
  * they are.
  *
  * `sbt "runMain graft.DedupScaleProbe [sfDir]"` — one JSON line per
  * (shape, k).
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Offset = 100000000L
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def rep(k: Int) = (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i * Offset)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"_$i")))).as("text"))
    }.reduce(_ union _)
    import spark.implicits._
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet

    def probe(shape: String, mk: Int => org.apache.spark.sql.DataFrame): Unit = {
      mk(1).count() // warm: JIT + codegen + parquet footer cache
      val base = pairSet(mk(1))
      Seq(1, 2, 4, 8).foreach { k =>
        val t0 = System.nanoTime()
        val p = mk(k).persist() // 3 actions below — compute the pipeline once
        val n = p.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val cross = p.filter(
          expr(s"doc_a div $Offset") =!= expr(s"doc_b div $Offset")).count()
        // SET equality, not count equality: swapping one borderline pair
        // for another would keep the count while breaking stability
        val rep0 = pairSet(p.filter(col("doc_b") < Offset))
        p.unpersist()
        require(cross == 0, s"[$shape] $cross cross-replica pairs at k=$k")
        require(rep0 == base,
          s"[$shape] replica-0 subgraph changed at k=$k: ±${(rep0 diff base).size + (base diff rep0).size} pairs")
        println(f"""{"shape":"$shape","k":$k,"sec":$sec%.3f,"pairs":$n,"cross":0,"rep0_stable":true}""")
      }
    }

    /** Per-DOC outputs (the span-tagger family): replicas share no
      * windows, so each replica's rows mirror replica 0's structure —
      * assert replica-0 rows bit-identical at every k AND total rows
      * exactly k× the base (every replica scored, none perturbed). */
    def probeDoc(shape: String, mk: Int => org.apache.spark.sql.DataFrame): Unit = {
      mk(1).count() // warm
      def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.mkString("|")).toSet
      val base = rows(mk(1))
      Seq(1, 2, 4, 8).foreach { k =>
        val t0 = System.nanoTime()
        val p = mk(k).persist()
        val n = p.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val rep0 = rows(p.filter(col("doc_id") < Offset))
        p.unpersist()
        require(rep0 == base,
          s"[$shape] replica-0 rows changed at k=$k: ±${(rep0 diff base).size + (base diff rep0).size}")
        require(n == k.toLong * base.size,
          s"[$shape] expected ${k * base.size} rows at k=$k, got $n")
        println(f"""{"shape":"$shape","k":$k,"sec":$sec%.3f,"rows":$n,"rep0_stable":true}""")
      }
    }

    probe("q21_minhash_lsh", k => Dedup.minhashLshFrom(rep(k), Dedup.MaxLshBucket))
    probe("q78_span_overlap", k => Dedup.spanOverlapFrom(rep(k), Dedup.MaxWindowDf))
    probeDoc("q99_dup_span_fraction", k => Dedup.dupSpanFractionFrom(rep(k)))
    probeDoc("q101_span_trim", k => Dedup.spanTrimFrom(rep(k)))
    spark.stop()
  }
}
