package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Layout

/** Round-11 lead item: the delete lifecycle over the graph-ANN
  * artifact family (q116 snapshot family: nngraph + exacttopk; q117
  * base family: groutesbase + nngraphbase). The maintained == rebuild
  * equality is the driver gate's subject (both oracles re-derive the
  * survivors from scratch); this spec pins the COMPLIANCE and
  * structure invariants around it: a deleted vector vanishes both as
  * a VERTEX and as a NEIGHBOR PAYLOAD, the affected sets are real
  * (the delete actually exercised the refill paths), and degree
  * bounds survive the maintenance. */
class AnnDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def isDel(c: org.apache.spark.sql.Column) =
    pmod(c, lit(Dedup.DelMod)) === lit(Dedup.DelRem)

  test("q116: deleted vectors vanish as vertices AND as neighbor payloads") {
    val census = Similarity.annDeleteGraph(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.keySet == Set("exacttopk_refreshed", "exacttopk_untouched",
      "nngraph_refreshed", "nngraph_untouched"))
    // the takedown exercised both refill paths for real
    assert(census("exacttopk_refreshed") > 0, "no probe lost a top-5 member")
    assert(census("nngraph_refreshed") > 0, "no vertex lost a neighbor")
    assert(census("exacttopk_untouched") > 0)
    // NO untouched assertion for the graph: under q106's shared 1/7
    // takedown a degree-16 vertex keeps all its neighbors with
    // probability (6/7)^16 ≈ 8.5%, and the one-hop A2 cascade takes
    // the rest — the affected cone IS effectively the whole graph at
    // this delete density (the census proves the split arithmetic
    // either way; the O(affected) benefit shows at production
    // takedown sizes, ppm-scale deletes). The base family's A1-only
    // split keeps a nonempty untouched set and is asserted in the
    // q117 test below.

    val g = spark.table(Layout.tableName(dir, "nngraphdel"))
    assert(g.filter(isDel(col("vec_id"))).count() == 0, "deleted vertex survives")
    assert(g.filter(isDel(col("nbr"))).count() == 0,
      "deleted vector survives as a NEIGHBOR (its payload was not purged)")
    // degree bound: G pool rows + NdAdd extras
    val deg = g.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(deg <= Similarity.GraphG + Similarity.NdAdd)
    // neighbor payloads belong to SURVIVORS and match the corpus
    val stale = g.join(
        Similarity.quantizedFrom(graft.sources.Tables.embeddings(spark, dir))
          .select(col("vec_id").as("nbr"), col("qn").as("cqn")),
        Seq("nbr"))
      .filter(col("nqn") =!= col("cqn")).count()
    assert(stale == 0, s"$stale maintained rows carry a stale neighbor payload")

    val etk = spark.table(Layout.tableName(dir, "exacttopkdel"))
    assert(etk.filter(isDel(col("probe_id"))).count() == 0, "deleted probe survives")
    assert(etk.filter(isDel(col("vec_id"))).count() == 0,
      "deleted vector survives in a probe's top-5")
    // every surviving probe holds exactly 5 ranked rows
    val badRanks = etk.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mr"), min(col("rnk")).as("nr"))
      .filter(col("n") =!= 5 || col("mr") =!= 5 || col("nr") =!= 1).count()
    assert(badRanks == 0, "a refilled probe's top-5 is not a dense 1..5 ranking")
  }

  test("q117: base-family delete purges routing rows and refills affected pool vertices") {
    val census = Similarity.annDeleteBase(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.keySet == Set("groutes", "nngraphbase_refreshed",
      "nngraphbase_untouched"))
    assert(census("nngraphbase_refreshed") > 0, "no base vertex lost a neighbor")
    // A1-only maintenance (no extras cascade): vertices with no
    // deleted pool-neighbor keep their rows verbatim, and at this
    // delete density some genuinely do — the observable footprint of
    // the O(affected) refill
    assert(census("nngraphbase_untouched") > 0, "refill touched every base vertex")

    val routes = spark.table(Layout.tableName(dir, "groutesbasedel"))
    assert(routes.filter(isDel(col("vec_id"))).count() == 0)
    val g = spark.table(Layout.tableName(dir, "nngraphbasedel"))
    assert(g.filter(isDel(col("vec_id"))).count() == 0)
    assert(g.filter(isDel(col("nbr"))).count() == 0,
      "deleted vector survives as a base-graph neighbor")
    val deg = g.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(deg <= Similarity.GraphG)
  }

  test("sparse delete: maintained == from-scratch rebuild with the held-extras carry path exercised") {
    // the driver gates run q106's 1/7 takedown, whose A2 cone covers
    // every vertex — the xKeep branch (held NN-descent extras carried
    // verbatim) is provably dead there. This drives the SAME
    // maintenance core with a sparse delete (~0.5% of vectors) and
    // proves row-for-row equality against the nnGraphOf from-scratch
    // survivor rebuild, with the carry path nonempty.
    import spark.implicits._
    val del = graft.sources.Tables.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(997)) === lit(7))
      .select(col("vec_id"))
    assert(del.count() > 0, "test premise: nonempty sparse delete")
    val (maintained, a2) = Similarity.nnGraphDeleteMaintainedFor(spark, dir, del)
    val rebuilt = Similarity.nnGraphRebuiltFor(spark, dir, del)
    val key = Seq("vec_id", "nbr", "nqn", "src")
    val onlyM = maintained.select(key.map(col): _*)
      .except(rebuilt.select(key.map(col): _*)).count()
    val onlyR = rebuilt.select(key.map(col): _*)
      .except(maintained.select(key.map(col): _*)).count()
    assert(onlyM == 0 && onlyR == 0,
      s"maintained != rebuild: $onlyM maintained-only, $onlyR rebuild-only rows")
    // the carry path is nonempty: surviving vertices OUTSIDE the A2
    // cone keep held extras verbatim
    val carried = maintained.filter(col("src") === "x")
      .join(a2, Seq("vec_id"), "left_anti").count()
    assert(carried > 0, "sparse delete still recomputed every extra (xKeep dead)")
    // and the cone is a strict subset of the graph — the refill did
    // NOT degenerate into a whole-graph recompute (a single-vector
    // takedown still cascades to its pool-mates and their in-
    // neighbors, a large fraction of this small dense test corpus;
    // at production corpus sizes the cone fraction is ~degree²/n)
    val nA2 = a2.count()
    val nVerts = maintained.select("vec_id").distinct().count()
    assert(nA2 < nVerts, s"A2 cone $nA2 covers all $nVerts vertices")
  }

  test("the delete census composes with q106's on one shared delete relation") {
    // q106 and q116/q117 rewrite different artifacts from the SAME
    // takedown set; the shared `ivfassigndel` survivor assignment is
    // built once and serves both (the once-gate) — its survivor set
    // must agree with the graph family's vertex survivors
    Similarity.annDeleteGraph(spark, dir).collect()
    val assignSurv = spark.table(Layout.tableName(dir, "ivfassigndel"))
    assert(assignSurv.filter(isDel(col("vec_id"))).count() == 0)
    val g = spark.table(Layout.tableName(dir, "nngraphdel"))
    val orphans = g.select(col("vec_id")).distinct()
      .join(assignSurv.select(col("vec_id")), Seq("vec_id"), "left_anti").count()
    assert(orphans == 0, s"$orphans graph vertices missing from the survivor assignment")
  }
}
