package graft

/** Dev probe: per-artifact attribution of the ANN setup pass (judge
  * round-14 item 5 — `similarity_shared` is one 20 s lump in
  * setup_tables; this breaks it down so the optimization targets the
  * real cost). Run: `sbt "runMain graft.SetupProbe"` (sf0.1 default,
  * SPARK_GRAFT_SF_DIR to override). Not part of the driver contract. */
object SetupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val S = graft.operators.Similarity
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[setupprobe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("exacttopk")(S.exactTopKTable(spark, sfDir).count())
    t("annIvfIndexed")(S.annIvfIndexed(spark, sfDir).count())
    t("pqcodes")(S.pqCodesTable(spark, sfDir, S.pqTrain(spark, sfDir)).count())
    t("ivfassignbase")(S.ivfAssignBase(spark, sfDir, S.ivfCentsBase(spark, sfDir)).count())
    t("ivfpq")(S.ivfPq(spark, sfDir).count())
    t("nngraph")(S.nnGraphTable(spark, sfDir).count())
    t("pqcodesbase")(S.pqCodesBaseTable(spark, sfDir).count())
    t("ivfpqbase")(S.ivfPqBaseTable(spark, sfDir).count())
    t("groutesbase")(S.gRoutesBase(spark, sfDir).count())
    t("nngraphbase")(S.nnGraphBaseTable(spark, sfDir).count())
    spark.stop()
  }
}
