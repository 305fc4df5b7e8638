package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** The dedup family's shared intermediates as WRITTEN tables (the
  * production snapshot shape, SURVEY §8.3d): the pair graph and the
  * corpus band index are warehouse tables produced once per
  * (session, dir), every consumer reads the on-disk artifact, and the
  * round-trip is semantics-free vs the uncached recompute. */
class GraphTableSpec extends SparkSpec {

  test("q21 reads the written pair-graph table, not the shingle pipeline") {
    val df = Dedup.minhashLsh(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pairgraph"),
      s"pair graph not read from its table:\n$plan")
    // the signature pipeline must NOT be in the per-consumer plan: no
    // band explode / signature aggregation above the table scan
    assert(!plan.contains("posexplode"), s"consumer re-runs banding:\n$plan")
  }

  test("written pair graph == uncached recompute (round-trip is lossless)") {
    val fromTable = Dedup.minhashLsh(spark, sfDir).collect().map(_.toString).toSeq
    val recompute = Dedup.minhashLshFrom(Tables.documents(spark, sfDir),
      Dedup.MaxLshBucket).collect().map(_.toString).toSeq
    assert(fromTable == recompute && fromTable.nonEmpty)
  }

  test("q77 reads the bucketed band-index table; only the batch side shuffles") {
    val df = Dedup.incrementalLsh(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("graft_bandindex"),
      s"corpus index not read from its table:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"index scan does not use the bucketing:\n$plan")
    // the standing corpus is never re-shuffled at query time: every
    // hashpartitioning exchange must sit on the O(batch) side / the
    // final ordering, so their count stays small and — critically —
    // none may feed directly from the band-index table scan subtree.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"unexpected exchange count $exchanges:\n$plan")
  }

  test("consumers of the written graph are unchanged: q38 clusters == recursive-CTE shape") {
    // q70's degree histogram is a pure function of the pair graph; its
    // total degree mass must equal 2x the pair count read from the table.
    val pairs = Dedup.minhashLsh(spark, sfDir).count()
    val degreeMass = Dedup.dupDegree(spark, sfDir)
      .select(sum(col("degree") * col("n_docs"))).collect()(0).getLong(0)
    assert(degreeMass == 2 * pairs && pairs > 0)
  }
}
