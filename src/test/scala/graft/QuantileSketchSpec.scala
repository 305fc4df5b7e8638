package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** q160 — mergeable quantile sketches: additive histogram state,
  * incremental maintenance, measured rank-error bounds. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out: Array[Row] =
    Pipeline.quantileSketch(spark, sfDir).collect()

  test("the sketch is additive: any corpus split merges to one state") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
    def hist(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      df.groupBy(col("source"), (col("n_chars") / 64).cast("long").as("b"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = hist(d)
    // three arbitrary residue parts, merged by summing counts
    val parts = (0 until 3).map(i =>
      hist(d.filter(pmod(col("doc_id"), lit(3)) === i)))
    val merged = parts.flatten.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == whole)
  }

  test("maintenance decisions: incremental == rebuild, sketch-table read") {
    def dec(name: String): Row = out.find(_.getString(0) == name).get
    assert(dec("zz_incremental_equals_rebuild").getLong(2) == 1L)
    assert(dec("zz_merge_reads_sketch_not_base").getLong(2) == 1L,
      "the maintenance plan must read the written sketch + the batch " +
        "slice only, never rescan the base corpus")
  }

  test("every quantile estimate's exact rank is within one bucket") {
    val qs = out.filter(!_.getString(0).startsWith("zz"))
    assert(qs.nonEmpty)
    qs.foreach { r =>
      assert(r.getLong(6) == 1L, s"rank error exceeded the bucket bound: $r")
      assert(r.getLong(5) >= r.getLong(4),
        s"exact rank below target — the estimate undershoots: $r")
    }
  }

  test("estimates agree with exact percentiles to within the bucket width") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sorted }
    out.filter(!_.getString(0).startsWith("zz")).foreach { r =>
      val vals = d(r.getString(0))
      val target = r.getLong(4).toInt
      val exact = vals(target - 1) // the target-th smallest value
      val est = r.getLong(3)
      assert(est >= exact && est - exact < 64,
        s"estimate $est vs exact $exact for $r")
    }
  }
}
