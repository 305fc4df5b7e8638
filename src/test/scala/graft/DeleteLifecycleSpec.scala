package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.{Layout, Tables}

/** Round-8 targeted-delete lifecycle (q106): the takedown path must
  * leave every derived written artifact exactly as a from-scratch
  * build over the surviving corpus would — the DuckDB oracle proves
  * it via checksums; this spec proves it through the product code
  * path and checks the physical properties the census can't see. */
class DeleteLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def delTable(what: String) =
    spark.table(Layout.tableName(sfDir, what + "del"))

  test("q106: rewritten artifacts equal rebuilds on survivors and carry no deleted keys") {
    val census = Dedup.deleteCensus(spark, sfDir).collect()
    assert(census.map(_.getString(0)).toSeq == Seq("bandindex", "ivfassign",
      "ivfpq", "pairgraph", "pqcodes", "shingles", "winindex"))

    val docs = Tables.documents(spark, sfDir)
    val deleted = docs.filter(pmod(col("doc_id"), lit(Dedup.DelMod)) === Dedup.DelRem)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(deleted.nonEmpty, "fixture delete set is empty")

    // delete-maintained pair graph == the pair pipeline re-run on the
    // surviving corpus (the oracle's claim, through the Scala path)
    val maintained = delTable("pairgraph")
      .select("doc_a", "doc_b", "n_eq").as[(Long, Long, Long)].collect().toSet
    val rebuilt = Dedup.minhashPairsFrom(
        docs.filter(pmod(col("doc_id"), lit(Dedup.DelMod)) =!= Dedup.DelRem),
        Dedup.MaxLshBucket)
      .select("doc_a", "doc_b", "n_eq").as[(Long, Long, Long)].collect().toSet
    assert(maintained == rebuilt && maintained.nonEmpty)

    // no deleted key survives anywhere, and every rewrite actually
    // removed rows (the delete set touches each artifact)
    def check(what: String, keyCols: Seq[String], full: Long): Unit = {
      val t = delTable(what)
      keyCols.foreach { kc =>
        val leaked = t.filter(col(kc).isInCollection(deleted)).count()
        assert(leaked == 0L, s"$what still carries $leaked rows of deleted $kc")
      }
      assert(t.count() < full, s"$what rewrite removed nothing")
    }
    check("pairgraph", Seq("doc_a", "doc_b"),
      spark.table(Layout.tableName(sfDir, "pairgraph")).count())
    check("shingles", Seq("doc_id"),
      spark.table(Layout.tableName(sfDir, "shingles")).count())
    check("bandindex", Seq("doc_id"),
      spark.table(Layout.tableName(sfDir, "bandindex")).count())
    check("winindex", Seq("doc_id"),
      spark.table(Layout.tableName(sfDir, "winindex")).count())
    check("ivfassign", Seq("vec_id"),
      spark.table(Layout.tableName(sfDir, "ivfassign")).count())
    check("pqcodes", Seq("vec_id"),
      spark.table(Layout.tableName(sfDir, "pqcodes")).count())
    check("ivfpq", Seq("vec_id"),
      spark.table(Layout.tableName(sfDir, "ivfpq")).count())
  }

  test("rewritten bucketed artifacts keep their bucket spec (pruning survives the delete)") {
    Dedup.deleteCensus(spark, sfDir).collect()
    val someCent = delTable("ivfassign").select(col("cent_id")).as[Long].head()
    // a bucket-keyed aggregation: exploits the bucketing (so the
    // planner keeps the bucketed scan) AND prunes on the IN literal
    val df = delTable("ivfassign").filter(col("cent_id").isin(someCent))
      .groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Bucketed: true"),
      s"delete rewrite lost the bucket layout:\n$plan")
    val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(plan)
    assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"no bucket pruning on the rewritten index:\n$plan")
  }
}
