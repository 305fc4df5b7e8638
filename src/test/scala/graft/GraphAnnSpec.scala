package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-9 stretch item: the graph-ANN regime (q107) is not just
  * present but EARNS its place — measured recall@5 of the batched
  * beam over the written kNN graph is never below plain IVF given the
  * SAME eval budget, and at the larger scale it is strictly better
  * (with the round-10 NN-descent round: 0.63 vs 0.53 at sf0.1; tie
  * 0.96/0.96 at sf0.01 — up from 0.55/0.48 and 0.92/0.92 pool-only).
  * Every quantity is exact integer arithmetic over deterministic
  * inputs, so these inequalities are stable gates, not flaky timing
  * assertions. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  test("q107: graph beam >= IVF at equal eval budget; strictly better at the larger scale") {
    Seq(("/root/testdata/sf0.01", false), ("/root/testdata/sf0.1", true))
      .foreach { case (dir, strict) =>
        val rows = Similarity.graphAnn(spark, dir)
          .select("method", "n_evals", "n_hits", "recall_at_5")
          .as[(String, Long, Long, Double)].collect()
          .map(r => r._1 -> r).toMap
        val g = rows("graph_beam"); val i = rows("ivf_np_eq")
        // equal budget BY CONSTRUCTION: np_eq is derived from the
        // beam's realized eval count, so the two methods' candidate
        // budgets must be within a few percent of each other
        val budgetGap = math.abs(g._2 - i._2).toDouble / math.max(g._2, i._2)
        assert(budgetGap <= 0.10,
          s"$dir: budgets not equalized (graph ${g._2} vs ivf ${i._2})")
        assert(g._4 >= i._4,
          s"$dir: graph recall ${g._4} below equal-budget IVF ${i._4}")
        if (strict) assert(g._4 > i._4,
          s"$dir: graph advantage lost at the larger scale (${g._4} vs ${i._4})")
      }
  }

  test("graphAnn frees every beam-hop checkpoint generation it creates") {
    val dir = "/root/testdata/sf0.01"
    Similarity.graphAnn(spark, dir).collect() // warm indexes + first run
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Similarity.graphAnn(spark, dir).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"graphAnn left ${leaked.size} persisted RDD(s) behind: $leaked")
  }

  test("the written neighbor graph has bounded degree and self-free edges") {
    val dir = "/root/testdata/sf0.01"
    val g = Similarity.nnGraphTable(spark, dir)
    val deg = g.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    val maxDeg = Similarity.GraphG + Similarity.NdAdd
    assert(deg <= maxDeg, s"degree $deg exceeds G+NdAdd=$maxDeg")
    // NN-descent must have ADDED edges somewhere (the refinement is
    // additive — a graph capped exactly at G would mean the round ran
    // as a no-op)
    assert(deg > Similarity.GraphG,
      s"no vertex carries an NN-descent extra edge (max degree $deg)")
    assert(g.filter(col("vec_id") === col("nbr")).count() == 0)
    // the carried neighbor payload matches the corpus vector (the
    // map-side scoring contract): spot-check via join equality
    val bad = g.join(
        Similarity.quantizedFrom(graft.sources.Tables.embeddings(spark, dir))
          .select(col("vec_id").as("nbr"), col("q").as("cq"), col("qn").as("cqn")),
        Seq("nbr"))
      .filter(col("nqn") =!= col("cqn")).count()
    assert(bad == 0, s"$bad graph rows carry a stale neighbor payload")
  }
}
