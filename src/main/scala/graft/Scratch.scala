package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.sources.Tables
import graft.functions.Fns._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("32").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val Dim = 64; val Planes = 32; val BandBits = 8

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[s] $name n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val planeW: Array[Array[Long]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(Planes, Dim) { (j, i0) =>
        md.reset()
        val hex = md.digest(s"p${j}_${i0 + 1}".getBytes("UTF-8")).map("%02x".format(_)).mkString
        1L - 2L * (java.lang.Long.parseLong(hex.substring(0, 8), 16) & 1L)
      }
    }

    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("qn", qnorm2(col("q")))

    val nb = Planes / BandBits
    val bands = e.select(col("vec_id"), col("q")).as[(Long, Array[Long])]
      .mapPartitions { it =>
        it.flatMap { case (id, q) =>
          (0 until nb).iterator.map { b =>
            var bucket = 0L
            var k = 0
            while (k < BandBits) {
              val w = planeW(b * BandBits + k)
              var s = 0L; var i = 0
              while (i < Dim) { s += w(i) * q(i); i += 1 }
              if (s >= 0) bucket |= 1L << k
              k += 1
            }
            (id, b, bucket)
          }
        }
      }.toDF("vec_id", "band", "bucket")
    time("bands-mp")(bands.count())
    time("bands-mp2")(bands.count())

    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bucket"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    val full = cand
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("qn").as("qna")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("qn").as("qnb")), Seq("vec_b"))
      .withColumn("cos", qcosineStatic(col("qa"), col("qb"), col("qna"), col("qnb"), Dim))
      .filter(col("cos") >= 0.4)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
    time("full")(full.count())
    time("full2")(full.count())

    // q37 stage timing
    val cents = e.filter(pmod(col("vec_id"), lit(32)) === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("qn").as("cqn"))
    val assign = e.join(broadcast(cents), lit(true))
      .withColumn("ccos", qcosineStatic(col("q"), col("cq"), col("qn"), col("cqn"), Dim))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("nc"), col("q"), col("qn"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cent_id"), col("m.q").as("q"), col("m.qn").as("qn"))
    time("ivf-assign")(assign.count())
    time("ivf-assign2")(assign.count())

    import org.apache.spark.sql.expressions.Window
    val wProbe = Window.partitionBy(col("probe_id")).orderBy(col("pcos").desc, col("cent_id"))
    val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("qn").as("pqn"))
      .join(broadcast(cents), lit(true))
      .withColumn("pcos", qcosineStatic(col("pq"), col("cq"), col("pqn"), col("cqn"), Dim))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("probe_id"), col("cent_id"), col("pq"), col("pqn"))
    time("ivf-probes")(probes.count())
    time("ivf-probes2")(probes.count())

    val wTop = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    val ivf = broadcast(probes).join(assign, Seq("cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", qcosineStatic(col("pq"), col("q"), col("pqn"), col("qn"), Dim))
      .select(col("probe_id"), col("vec_id"), col("cos"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("vec_id"), col("cos"), col("rnk"))
      .orderBy("probe_id", "rnk")
    time("ivf-full")(ivf.count())
    time("ivf-full2")(ivf.count())
    ivf.explain("formatted")
    spark.stop()
  }
}
