package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Design probe for the GRAPH-ANN regime (round-9 stretch item): a
  * pruned kNN neighbor graph (G nearest within-IVF-cell neighbors per
  * vector — the navigable layer-0 an HNSW build maintains) searched
  * with seed-and-expand: route the probe to its nearest cell (IVF
  * nprobe=1), take the E closest cell members as seeds, expand H graph
  * hops, exact-score the candidate set. All arithmetic local driver
  * math through the product's own routing/cosine functions
  * (`RecallGrid`'s method), so a (E, G, H) cell's recall IS what the
  * gated query would report with those constants compiled in.
  *
  * Reports recall@5 and the exact-evaluation budget (distinct scored
  * candidates per probe) next to IVF rows at nprobe 2/4/8 — the
  * decision input for whether the graph path earns a gated query:
  * `sbt "runMain graft.GraphAnnProbe"`. */
object GraphAnnProbe {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Similarity.quantizedFrom(graft.sources.Tables.embeddings(spark, dir))
        .select(col("vec_id"), col("q"), col("qn"))
        .as[(Long, Array[Long], Long)].collect().sortBy(_._1)
      val byId = e.map(t => t._1 -> t).toMap
      val sample = Similarity.trainSample(spark, dir)
      val cents = Similarity.lloydCents(sample, Similarity.ivfK(spark, dir)).sortBy(_._1)
      val assign: Map[Long, Long] = e.map { case (id, q, qn) =>
        id -> Similarity.routeCents(q, qn, cents, 1).head
      }.toMap
      val cells: Map[Long, Array[Long]] =
        assign.toSeq.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).sorted.toArray }
      val probes = e.filter(_._1 % 100 == 0).sortBy(_._1).take(Similarity.MaxProbes)
      val np = probes.length
      def cos(a: Long, b: Long): Double = {
        val (_, qa, na) = byId(a); val (_, qb, nb) = byId(b)
        Similarity.jcosine(qa, na, qb, nb)
      }
      def cosP(p: (Long, Array[Long], Long), b: Long): Double = {
        val (_, qb, nb) = byId(b)
        Similarity.jcosine(p._2, p._3, qb, nb)
      }
      val exact5: Map[Long, Set[Long]] = probes.map { p =>
        p._1 -> e.filter(_._1 != p._1)
          .map(v => (cosP(p, v._1), v._1)).sorted(Similarity.cosDescIdAsc)
          .take(5).map(_._2).toSet
      }.toMap

      // IVF baselines at nprobe 2/4/8, plus the budget-equalized
      // points the q107 comparison row would use (np_eq ≈ 21 at
      // sf0.01, 7 at sf0.1 for the B4/H4 beam's realized evals)
      for (nprobe <- Seq(2, 4, 7, 8, 21)) {
        var hits = 0; var evals = 0L
        probes.foreach { p =>
          val cs = Similarity.routeCents(p._2, p._3, cents, nprobe)
          val cand = cs.flatMap(c => cells.getOrElse(c, Array.empty[Long]))
            .filter(_ != p._1)
          evals += cand.size
          val top5 = cand.map(v => (cosP(p, v), v)).sorted(Similarity.cosDescIdAsc)
            .take(5).map(_._2).toSet
          hits += (top5 & exact5(p._1)).size
        }
        println(f"""{"sf":"$sf","method":"ivf","nprobe":$nprobe,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np}}""")
      }

      // neighbor graph with CROSS-CELL edges: every vector is graph-
      // assigned to its top-R cells (R=2 — assignment replication, the
      // standard boundary fix), and its G nearest neighbors are drawn
      // from the union of those cells' members. A within-cell-only
      // graph could never leave the entry cell, capping recall at IVF
      // nprobe=1 by construction.
      val R = 2
      val gcells: Map[Long, Array[Long]] = e
        .flatMap { case (id, q, qn) =>
          Similarity.routeCents(q, qn, cents, R).map(c => (c, id)) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sorted }
      for (g <- Seq(4, 8); eSeeds <- Seq(2, 4, 8); hops <- Seq(1, 2)) {
        val graph: Map[Long, Array[Long]] = e.map { case (id, q, qn) =>
          val pool = Similarity.routeCents(q, qn, cents, R)
            .flatMap(c => gcells.getOrElse(c, Array.empty[Long]))
            .distinct.filter(_ != id)
          id -> pool.map(u => (cos(id, u), u)).sorted(Similarity.cosDescIdAsc)
            .take(g).map(_._2).toArray
        }.toMap
        var hits = 0; var evals = 0L
        probes.foreach { p =>
          val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
          val cell = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1)
          // seed scoring evaluates the whole entry cell (as IVF np=1 would)
          val scoredCell = cell.map(v => (cosP(p, v), v)).sorted(Similarity.cosDescIdAsc)
          val seeds = scoredCell.take(eSeeds).map(_._2)
          var frontier = seeds.toSet
          var cand = cell.toSet
          (1 to hops).foreach { _ =>
            val nxt = frontier.flatMap(v => graph.getOrElse(v, Array.empty[Long]))
              .diff(cand) - p._1
            cand ++= nxt
            frontier = nxt
          }
          evals += cand.size
          val top5 = cand.toSeq.map(v => (cosP(p, v), v))
            .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
          hits += (top5 & exact5(p._1)).size
        }
        println(f"""{"sf":"$sf","method":"graph","G":$g,"E":$eSeeds,"hops":$hops,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np}}""")
      }

      // upper bound of the regime: EXACT kNN graph (the layer-0 an
      // HNSW build converges to) searched BEST-FIRST under a fixed
      // eval budget — if even this loses to IVF at equal budget, the
      // corpus geometry does not reward navigability and the graph
      // path does not earn a gated query
      for (g <- Seq(8, 16)) {
        val graph: Map[Long, Array[Long]] = e.map { case (id, _, _) =>
          id -> e.filter(_._1 != id)
            .map(u => (cos(id, u._1), u._1)).sorted(Similarity.cosDescIdAsc)
            .take(g).map(_._2)
        }.toMap
        for (budget <- Seq(30, 60, 120, 240)) {
          var hits = 0; var evals = 0L
          probes.foreach { p =>
            val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
            val entry = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1).take(4)
            val scored = scala.collection.mutable.Map[Long, Double]()
            def score(v: Long): Double =
              scored.getOrElseUpdate(v, cosP(p, v))
            entry.foreach(score)
            // best-first: expand the best scored-but-unexpanded node
            val expanded = scala.collection.mutable.Set[Long]()
            while (scored.size < budget &&
              scored.keys.exists(v => !expanded.contains(v))) {
              val next = scored.filter(kv => !expanded.contains(kv._1))
                .maxBy(kv => (kv._2, -kv._1))._1
              expanded += next
              graph.getOrElse(next, Array.empty[Long])
                .filter(_ != p._1).take(budget - scored.size + 1)
                .foreach(score)
            }
            evals += scored.size
            val top5 = scored.toSeq.map { case (v, c) => (c, v) }
              .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
            hits += (top5 & exact5(p._1)).size
          }
          println(f"""{"sf":"$sf","method":"knn_beam","G":$g,"budget":$budget,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np}}""")
        }
      }

      // the GATEABLE configuration: R-cell-bounded kNN graph (build =
      // one bounded self-join, the 100 TB shape) searched with a
      // BATCHED beam (H unrollable hops, expand the top-B unexpanded
      // per hop) — deterministic and SQL-twin-able, unlike sequential
      // best-first. If this holds the exact-graph/beam numbers, it
      // earns the gated query.
      for (rB <- Seq(4); g <- Seq(16); beamB <- Seq(4, 8); hH <- Seq(3, 4)) {
        val pool: Map[Long, Array[Long]] = {
          val gc = e.flatMap { case (id, q, qn) =>
            Similarity.routeCents(q, qn, cents, rB).map(c => (c, id)) }
            .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sorted }
          e.map { case (id, q, qn) =>
            id -> Similarity.routeCents(q, qn, cents, rB)
              .flatMap(c => gc.getOrElse(c, Array.empty[Long]))
              .distinct.filter(_ != id).toArray
          }.toMap
        }
        val graph: Map[Long, Array[Long]] = e.map { case (id, _, _) =>
          id -> pool(id).map(u => (cos(id, u), u)).sorted(Similarity.cosDescIdAsc)
            .take(g).map(_._2)
        }.toMap
        var hits = 0; var evals = 0L
        probes.foreach { p =>
          val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
          val entry = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1)
          val scored = scala.collection.mutable.Map[Long, Double]()
          entry.foreach(v => scored.getOrElseUpdate(v, cosP(p, v)))
          val expanded = scala.collection.mutable.Set[Long]()
          (1 to hH).foreach { _ =>
            val beam = scored.filter(kv => !expanded.contains(kv._1)).toSeq
              .map { case (v, c) => (c, v) }.sorted(Similarity.cosDescIdAsc)
              .take(beamB).map(_._2)
            expanded ++= beam
            beam.foreach(v => graph.getOrElse(v, Array.empty[Long])
              .filter(_ != p._1).foreach(u => scored.getOrElseUpdate(u, cosP(p, u))))
          }
          evals += scored.size
          val top5 = scored.toSeq.map { case (v, c) => (c, v) }
            .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
          hits += (top5 & exact5(p._1)).size
        }
        println(f"""{"sf":"$sf","method":"bounded_beam","R":$rB,"G":$g,"B":$beamB,"H":$hH,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np}}""")
      }

      // NN-DESCENT refinement (round-10 item 4): the pool-based graph
      // misses true neighbors that share no routed cell; each NND
      // round proposes neighbors-of-best-neighbors (expansion via the
      // top-NdB edges only — the sampled-candidate form, n·NdB·G
      // candidate pairs per round, linear) and re-takes top-G. Rows
      // measure how much of the 0.55 → 0.65 exact-kNN-graph headroom
      // each round recovers at the GATED beam dials (R4/G16/B4/H4).
      {
        val rB = 4; val g = 16; val beamB = 4; val hH = 4
        val gc = e.flatMap { case (id, q, qn) =>
          Similarity.routeCents(q, qn, cents, rB).map(c => (c, id)) }
          .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sorted }
        val g0: Map[Long, Array[Long]] = e.map { case (id, q, qn) =>
          val pool = Similarity.routeCents(q, qn, cents, rB)
            .flatMap(c => gc.getOrElse(c, Array.empty[Long]))
            .distinct.filter(_ != id)
          id -> pool.map(u => (cos(id, u), u)).sorted(Similarity.cosDescIdAsc)
            .take(g).map(_._2).toArray
        }.toMap
        def nndRound(graph: Map[Long, Array[Long]], ndB: Int,
                     rev: Boolean): Map[Long, Array[Long]] = {
          val reverse: Map[Long, Array[Long]] =
            if (!rev) Map.empty
            else graph.toSeq.flatMap { case (id, nbrs) => nbrs.map(_ -> id) }
              .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toArray }
          graph.map { case (id, nbrs) =>
            val seed = if (rev)
              (nbrs ++ reverse.getOrElse(id, Array.empty[Long])).distinct
            else nbrs
            val cand = (nbrs ++ seed.sorted.take(ndB)
              .flatMap(m => graph.getOrElse(m, Array.empty[Long])
                ++ reverse.getOrElse(m, Array.empty[Long])))
              .distinct.filter(_ != id)
            id -> cand.map(u => (cos(id, u), u)).sorted(Similarity.cosDescIdAsc)
              .take(g).map(_._2)
          }
        }
        // ADDITIVE variant: keep every pool edge (their far edges carry
        // the navigability the replace-variant destroys at sf0.01) and
        // add the top-`ndAdd` NEW candidates per vertex.
        def nndAdd(graph: Map[Long, Array[Long]], ndB: Int, ndAdd: Int,
                   rev: Boolean): Map[Long, Array[Long]] = {
          val reverse: Map[Long, Array[Long]] =
            if (!rev) Map.empty
            else graph.toSeq.flatMap { case (id, nbrs) => nbrs.map(_ -> id) }
              .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toArray }
          graph.map { case (id, nbrs) =>
            val have = nbrs.toSet
            val seed = if (rev)
              (nbrs ++ reverse.getOrElse(id, Array.empty[Long])).distinct
            else nbrs
            val fresh = seed.sorted.take(ndB)
              .flatMap(m => graph.getOrElse(m, Array.empty[Long])
                ++ reverse.getOrElse(m, Array.empty[Long]))
              .distinct.filter(u => u != id && !have.contains(u))
            id -> (nbrs ++ fresh.map(u => (cos(id, u), u))
              .sorted(Similarity.cosDescIdAsc).take(ndAdd).map(_._2))
          }
        }
        // PRODUCT-EXACT additive round: expansion via the top-`ndB`
        // edges BY RANK (the gated rn <= NdExp), candidates scored,
        // top-`ndAdd` not-already-adjacent appended. Also derives the
        // realized np_eq with the gated integer formula and reports
        // the IVF row at exactly that nprobe — so a grid cell here IS
        // the (graph_recall, ivf_recall) pair GraphAnnSpec would gate.
        val nCorpus = e.length.toLong
        def nndAddRank(graph: Map[Long, Array[Long]], ndB: Int,
                       ndAdd: Int): Map[Long, Array[Long]] =
          graph.map { case (id, nbrs) =>
            val have = nbrs.toSet
            val fresh = nbrs.take(ndB)
              .flatMap(m => graph.getOrElse(m, Array.empty[Long]))
              .distinct.filter(u => u != id && !have.contains(u))
            id -> (nbrs ++ fresh.map(u => (cos(id, u), u))
              .sorted(Similarity.cosDescIdAsc).take(ndAdd).map(_._2))
          }
        for (ndB <- Seq(4, 8, 16); ndAdd <- Seq(2, 4)) {
          val graph = nndAddRank(g0, ndB, ndAdd)
          var hits = 0; var evals = 0L
          probes.foreach { p =>
            val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
            val entry = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1)
            val scored = scala.collection.mutable.Map[Long, Double]()
            entry.foreach(v => scored.getOrElseUpdate(v, cosP(p, v)))
            val expanded = scala.collection.mutable.Set[Long]()
            (1 to hH).foreach { _ =>
              val beam = scored.filter(kv => !expanded.contains(kv._1)).toSeq
                .map { case (v, c) => (c, v) }.sorted(Similarity.cosDescIdAsc)
                .take(beamB).map(_._2)
              expanded ++= beam
              beam.foreach(v => graph.getOrElse(v, Array.empty[Long])
                .filter(_ != p._1).foreach(u => scored.getOrElseUpdate(u, cosP(p, u))))
            }
            evals += scored.size
            val top5 = scored.toSeq.map { case (v, c) => (c, v) }
              .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
            hits += (top5 & exact5(p._1)).size
          }
          // the gated equal-budget comparison at the REALIZED evals
          val npEq = math.max(1L,
            (2L * evals * cents.length + np * nCorpus) / (2L * np * nCorpus)).toInt
          var ihits = 0; var ievals = 0L
          probes.foreach { p =>
            val cs = Similarity.routeCents(p._2, p._3, cents, npEq)
            val cand = cs.flatMap(c => cells.getOrElse(c, Array.empty[Long]))
              .filter(_ != p._1)
            ievals += cand.size
            val top5 = cand.map(v => (cosP(p, v), v)).sorted(Similarity.cosDescIdAsc)
              .take(5).map(_._2).toSet
            ihits += (top5 & exact5(p._1)).size
          }
          println(f"""{"sf":"$sf","method":"nnd_add_rank","ndB":$ndB,"ndAdd":$ndAdd,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np},"np_eq":$npEq,"ivf_recall":${ihits / (5.0 * np)}%.3f,"ivf_evals":${ievals / np}}""")
        }
        // round-11 item 7: a SECOND product-exact additive round at
        // the GATED dials (NdExp=16/NdAdd=4) — round 2 re-sorts each
        // adjacency list by cosine (the union of pool rank order and
        // appended extras has no global rank) and appends up to NdAdd
        // more not-already-adjacent candidates. Adopt round 2 in the
        // gated build only if this pair's recall rises; otherwise the
        // plateau is recorded in BASELINE.md.
        for (rounds <- Seq(1, 2)) {
          val graph = (1 to rounds).foldLeft(g0) { (gr, _) =>
            val sorted = gr.map { case (id, nbrs) =>
              id -> nbrs.map(u => (cos(id, u), u))
                .sorted(Similarity.cosDescIdAsc).map(_._2)
            }
            nndAddRank(sorted, 16, 4)
          }
          var hits = 0; var evals = 0L
          probes.foreach { p =>
            val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
            val entry = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1)
            val scored = scala.collection.mutable.Map[Long, Double]()
            entry.foreach(v => scored.getOrElseUpdate(v, cosP(p, v)))
            val expanded = scala.collection.mutable.Set[Long]()
            (1 to hH).foreach { _ =>
              val beam = scored.filter(kv => !expanded.contains(kv._1)).toSeq
                .map { case (v, c) => (c, v) }.sorted(Similarity.cosDescIdAsc)
                .take(beamB).map(_._2)
              expanded ++= beam
              beam.foreach(v => graph.getOrElse(v, Array.empty[Long])
                .filter(_ != p._1).foreach(u => scored.getOrElseUpdate(u, cosP(p, u))))
            }
            evals += scored.size
            val top5 = scored.toSeq.map { case (v, c) => (c, v) }
              .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
            hits += (top5 & exact5(p._1)).size
          }
          val npEq = math.max(1L,
            (2L * evals * cents.length + np * nCorpus) / (2L * np * nCorpus)).toInt
          var ihits = 0L
          probes.foreach { p =>
            val cs = Similarity.routeCents(p._2, p._3, cents, npEq)
            val cand = cs.flatMap(c => cells.getOrElse(c, Array.empty[Long]))
              .filter(_ != p._1)
            val top5 = cand.map(v => (cosP(p, v), v)).sorted(Similarity.cosDescIdAsc)
              .take(5).map(_._2).toSet
            ihits += (top5 & exact5(p._1)).size
          }
          println(f"""{"sf":"$sf","method":"nnd_gated_rounds","rounds":$rounds,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np},"np_eq":$npEq,"ivf_recall":${ihits / (5.0 * np)}%.3f}""")
        }
        for (ndB <- Seq(2, 4, 8); rounds <- Seq(1, 2); rev <- Seq(false, true)) {
          val graph = (1 to rounds).foldLeft(g0)((gr, _) => nndRound(gr, ndB, rev))
          var hits = 0; var evals = 0L
          probes.foreach { p =>
            val c0 = Similarity.routeCents(p._2, p._3, cents, 1).head
            val entry = cells.getOrElse(c0, Array.empty[Long]).filter(_ != p._1)
            val scored = scala.collection.mutable.Map[Long, Double]()
            entry.foreach(v => scored.getOrElseUpdate(v, cosP(p, v)))
            val expanded = scala.collection.mutable.Set[Long]()
            (1 to hH).foreach { _ =>
              val beam = scored.filter(kv => !expanded.contains(kv._1)).toSeq
                .map { case (v, c) => (c, v) }.sorted(Similarity.cosDescIdAsc)
                .take(beamB).map(_._2)
              expanded ++= beam
              beam.foreach(v => graph.getOrElse(v, Array.empty[Long])
                .filter(_ != p._1).foreach(u => scored.getOrElseUpdate(u, cosP(p, u))))
            }
            evals += scored.size
            val top5 = scored.toSeq.map { case (v, c) => (c, v) }
              .sorted(Similarity.cosDescIdAsc).take(5).map(_._2).toSet
            hits += (top5 & exact5(p._1)).size
          }
          println(f"""{"sf":"$sf","method":"bounded_beam_nnd","R":$rB,"G":$g,"B":$beamB,"H":$hH,"ndB":$ndB,"rounds":$rounds,"rev":$rev,"recall":${hits / (5.0 * np)}%.3f,"evals_per_probe":${evals / np}}""")
        }
      }
    }
    spark.stop()
  }
}
