package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** The scale-shaped joins must be semantics-preserving rewrites:
  * salting and binning change the shuffle keys, never the result. */
class JoinShapesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join (salting is result-invariant)") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
      .as[(String, Long)].collect().toMap
    val salted = Relational.saltedJoin(spark, sfDir)
      .select(col("o_orderpriority"), col("n_items"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("skewJoin with a genuinely hot key still equals the plain join") {
    // one order with 5000 lineitems (hot above threshold 1000), plus colds
    val li = (1 to 5000).map(i => (42L, i, 10.0, 0.1)) ++
      (1 to 50).map(i => (100L + i, 1, 5.0, 0.0))
    val liDf = li.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val ord = ((42L, "1-URGENT") +: (1 to 50).map(i => (100L + i.toLong, "5-LOW")))
      .toDF("o_orderkey", "o_orderpriority")
    val plain = liDf.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_items"))
      .as[(String, Long)].collect().toMap
    val skew = Relational.skewJoin(liDf, ord, threshold = 1000L)
      .select(col("o_orderpriority"), col("n_items"))
      .as[(String, Long)].collect().toMap
    assert(skew == plain)
    assert(plain == Map("1-URGENT" -> 5000L, "5-LOW" -> 50L))
  }

  test("bucketed fact-fact join: zero shuffle in the plan, same result as plain join") {
    // SURVEY §9: at 100 TB, lineitem+orders are BUCKETed by orderkey so
    // the q07-shape join is shuffle-free. Prove the mechanism end to
    // end: bucketed catalog tables -> SMJ with NO ShuffleExchange.
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      // collect() on THIS DataFrame so its queryExecution carries the
      // final plan (count() would execute a separate one)
      val n = joined.collect().length.toLong
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain && n > 0)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      // shuffles print as "Exchange hashpartitioning(...)" — the node
      // name is never "ShuffleExchange", so match the real token
      assert("Exchange (hash|range)partitioning".r.findFirstIn(plan).isEmpty,
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("binned range join == naive inequality join") {
    val ev = Tables.events(spark, sfDir)
    val naive = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") - expr("INTERVAL 30 MINUTES") &&
          col("b.ts") < col("a.ts"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .as[(String, Long)].collect().toMap
    val binned = Relational.rangeJoin(spark, sfDir)
      .select(col("event_type"), col("n_pairs"))
      .as[(String, Long)].collect().toMap
    assert(binned == naive)
    assert(naive.values.sum > 0)
  }
}
