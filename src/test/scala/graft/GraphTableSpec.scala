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

  test("observe metrics inside a materializedTable build fire on the write execution") {
    // the amended cap-observability contract: metrics wrapped around a
    // snapshot build are recorded when the snapshot is WRITTEN — the
    // execution a production QueryExecutionListener monitors. Proven
    // with a probe metric through the real writer.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get("graft.obs_probe")
          .foreach(r => seen.add((r.getAs[Long]("n_rows"), r.getAs[Long]("max_id"))))
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.sources.Layout.materializedTable(spark, sfDir, "obsprobe") {
        spark.range(10).toDF("id").observe("graft.obs_probe",
          count(lit(1)).as("n_rows"), max(col("id")).as("max_id"))
      }
      // listener delivery is async; poll to a deadline
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.peek() == (10L, 9L),
        s"write-execution metrics not observed: ${seen}")
    } finally spark.listenerManager.unregister(listener)
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
