package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Offline recall sweep for the ANN codebook dials (round-8 item 1):
  * `sbt "runMain graft.RecallGrid"` measures recall@5 of the four ANN
  * paths (IVF / PQ-ADC / ADC→re-rank / IVF-PQ) against exact cosine at
  * sf0.01 AND sf0.1 for a grid of (PqK, LloydIters) — all math local
  * driver arithmetic through the SAME [[Similarity.lloydCents]] /
  * [[Similarity.lloydCodebook]] / [[Similarity.adcTable]] the queries
  * and their SQL twins use, so a grid cell's recall IS what q96 would
  * report with those constants compiled in. Exists because choosing
  * the dials by rebuilding q96 per candidate costs a full
  * Spark+DuckDB cycle per cell; this sweeps the grid in seconds. */
object RecallGrid {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }
  private def hash60(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).substring(0, 15), 16)

  // the product total orders: cosDescIdAsc IS the queries' comparator
  private val byCos: Ordering[(Double, Long)] = Similarity.cosDescIdAsc
  private val byDist: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def top5Ids[T](xs: Seq[(T, Long)])(implicit ord: Ordering[(T, Long)]): Set[Long] =
    xs.sorted(ord).take(5).map(_._2).toSet

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Similarity.quantizedFrom(graft.sources.Tables.embeddings(spark, dir))
        .select(col("vec_id"), col("q"), col("qn"))
        .as[(Long, Array[Long], Long)].collect().sortBy(_._1)
      val sample = e.map { case (id, q, qn) => ((hash60(id), id), (id, q, qn)) }
        .sortBy(_._1).map(_._2).take(Similarity.trainNOf(e.length.toLong))
      val probes = e.filter(_._1 % 100 == 0).sortBy(_._1).take(Similarity.MaxProbes)
      val np = probes.length
      val exact5: Map[Long, Set[Long]] = probes.map { case (pid, pq, pqn) =>
        pid -> top5Ids(e.toSeq.collect {
          case (id, q, qn) if id != pid => (Similarity.jcosine(pq, pqn, q, qn), id)
        })(byCos)
      }.toMap
      def recall(sets: Map[Long, Set[Long]]): Double =
        sets.map { case (pid, s) => (s & exact5(pid)).size }.sum.toDouble / (5.0 * np)

      for (iters <- args.lift(0).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 4, 8, 16))) {
        // IVF at these iters (K = the snapshot-adaptive capacity the
        // queries would compile in: clamp(n/32, [64, 1024]) — see ivfKOf)
        val cents = Similarity.lloydCents(sample, Similarity.ivfKOf(e.length.toLong), iters)
        val assign: Map[Long, Long] = e.map { case (id, q, qn) =>
          id -> Similarity.routeCents(q, qn, cents, 1).head
        }.toMap
        val routes: Map[Long, Set[Long]] = probes.map { case (pid, pq, pqn) =>
          pid -> Similarity.routeCents(pq, pqn, cents, 2).toSet
        }.toMap
        val ivf5 = probes.map { case (pid, pq, pqn) =>
          pid -> top5Ids(e.toSeq.collect {
            case (id, q, qn) if id != pid && routes(pid).contains(assign(id)) =>
              (Similarity.jcosine(pq, pqn, q, qn), id)
          })(byCos)
        }.toMap
        val centById = cents.map(c => c._1 -> c).toMap
        val adaptive = Similarity.pqKOf(sample.length)
        for (pqK <- args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 64, adaptive, 256)).distinct) {
          val cb = Similarity.lloydCodebook(sample, pqK, iters)
          val codes: Array[(Long, Array[Int])] = e.map { case (id, q, _) => (id, Similarity.pqEncode(q, cb)) }
          val eById = e.map(t => t._1 -> t).toMap
          def adist(t: Array[Long], cs: Array[Int]): Long = {
            var d = 0L; var sub = 0
            while (sub < Similarity.PqSubs) { d += t(sub * pqK + cs(sub) - 1); sub += 1 }
            d
          }
          def recon(cs: Array[Int]): Array[Long] = {
            val r = new Array[Long](Similarity.Dim)
            var sub = 0
            while (sub < Similarity.PqSubs) {
              var i = 0
              while (i < Similarity.PqDim) {
                r(sub * Similarity.PqDim + i) = cb(cs(sub) - 1)._2(sub * Similarity.PqDim + i)
                i += 1
              }
              sub += 1
            }
            r
          }
          val adcAll: Map[Long, Seq[(Long, Long)]] = probes.map { case (pid, pq, _) =>
            val t = Similarity.adcTable(pq, cb)
            pid -> codes.toSeq.collect { case (id, cs) if id != pid => (adist(t, cs), id) }
          }.toMap
          val adc5 = adcAll.map { case (pid, xs) => pid -> top5Ids(xs)(byDist) }
          val rr5 = probes.map { case (pid, pq, pqn) =>
            val short = adcAll(pid).sorted(byDist).take(Similarity.PqShortlist).map(_._2)
            pid -> top5Ids(short.map { id =>
              val (_, q, qn) = eById(id); (Similarity.jcosine(pq, pqn, q, qn), id)
            })(byCos)
          }.toMap
          // flat cosine-ADC: rank by approx cosine of the reconstruction
          val cosAll: Map[Long, Seq[(Double, Long)]] = probes.map { case (pid, pq, pqn) =>
            pid -> codes.toSeq.collect { case (id, cs) if id != pid =>
              val r = recon(cs)
              val rn = r.map(x => x * x).sum
              (if (rn == 0L) Double.NegativeInfinity else Similarity.jcosine(pq, pqn, r, rn), id)
            }
          }.toMap
          val cadc5 = cosAll.map { case (pid, xs) => pid -> top5Ids(xs)(byCos) }
          val crr5 = probes.map { case (pid, pq, pqn) =>
            val short = cosAll(pid).sorted(byCos).take(Similarity.PqShortlist).map(_._2)
            pid -> top5Ids(short.map { id =>
              val (_, q, qn) = eById(id); (Similarity.jcosine(pq, pqn, q, qn), id)
            })(byCos)
          }.toMap
          val ipq5 = probes.map { case (pid, pq, _) =>
            val t = Similarity.adcTable(pq, cb)
            pid -> top5Ids(codes.toSeq.collect {
              case (id, cs) if id != pid && routes(pid).contains(assign(id)) => (adist(t, cs), id)
            })(byDist)
          }.toMap
          // residual IVF-PQ: encode q - cent(assign(q)), probe residual per routed cell
          val resSample = sample.map { case (id, q, qn) =>
            val cid = Similarity.routeCents(q, qn, cents, 1).head
            val cq = centById(cid)._2
            val r = Array.tabulate(Similarity.Dim)(i => q(i) - cq(i))
            (id, r, r.map(x => x * x).sum)
          }
          val resCb = Similarity.lloydCodebook(resSample, pqK, iters)
          val resCodes: Map[Long, Array[Int]] = e.map { case (id, q, _) =>
            val cq = centById(assign(id))._2
            id -> Similarity.pqEncode(Array.tabulate(Similarity.Dim)(i => q(i) - cq(i)), resCb)
          }.toMap
          val ripq5 = probes.map { case (pid, pq, _) =>
            val cand = routes(pid).toSeq.flatMap { cid =>
              val cq = centById(cid)._2
              val pr = Array.tabulate(Similarity.Dim)(i => pq(i) - cq(i))
              val t = Similarity.adcTable(pr, resCb)
              e.toSeq.collect { case (id, _, _) if id != pid && assign(id) == cid =>
                (adist(t, resCodes(id)), id)
              }
            }
            pid -> top5Ids(cand)(byDist)
          }.toMap
          println(f"[grid] $sf%-7s iters=$iters%-3d pqK=$pqK%-4d " +
            f"ivf=${recall(ivf5)}%.3f adc=${recall(adc5)}%.3f cadc=${recall(cadc5)}%.3f " +
            f"rerank=${recall(rr5)}%.3f crerank=${recall(crr5)}%.3f " +
            f"ivfpq=${recall(ipq5)}%.3f ripq=${recall(ripq5)}%.3f (np=$np)")
        }
      }
    }
    spark.stop()
  }
}
