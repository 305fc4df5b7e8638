package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Column-helper semantics, incl. cross-engine portability anchors. */
class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("javaRound reproduces Java Math.round incl. negative halves") {
    val xs = Seq(2.5, 2.4, -2.5, -2.6, -0.5, 0.5, 0.0, 1.0e9 + 0.5)
    val got = xs.toDF("x").select(javaRound(col("x"))).as[Long].collect()
    assert(got.toSeq == xs.map(x => Math.round(x)))
  }

  test("javaRound property: equals Math.round on seeded random doubles") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(500)((rnd.nextInt(2000001) - 1000000) / 100.0)
    val got = xs.toDF("x").select(javaRound(col("x"))).as[Long].collect()
    assert(got.toSeq == xs.map(x => Math.round(x)))
  }

  test("hash32/hash60 are the md5-derived constants DuckDB computes") {
    // DuckDB: SELECT CAST('0x'||substr(md5('abc'),1,8) AS BIGINT) = 2416005272;
    //         md5('abc') = 900150983cd24fb0d6963f7d28e17f72
    val (h32, h60) = Seq("abc").toDF("s")
      .select(hash32(col("s")), hash60(col("s"))).as[(Long, Long)].head()
    assert(h32 == 2416005272L)
    assert(h60 == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("shingles builds k-grams; short inputs give empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(shingles(tokens(col("t")), 3).as("sh")).as[Seq[String]].collect()
    assert(df(0) == Seq("a b c", "b c d"))
    assert(df(1) == Seq.empty)
  }

  test("normText collapses spaces, trims, lowercases") {
    val got = Seq("  A  B c ").toDF("t").select(normText(col("t"))).as[String].head()
    assert(got == "a b c")
  }

  test("quantized cosine ≈ double cosine and is symmetric") {
    val a = Array(0.5f, -0.25f, 0.125f, 1.0f)
    val b = Array(0.25f, 0.5f, -1.0f, 0.75f)
    val df = Seq((a, b)).toDF("a", "b")
      .select(quantize(col("a")).as("qa"), quantize(col("b")).as("qb"))
      .select(
        qcosine(col("qa"), col("qb"), qnorm2(col("qa")), qnorm2(col("qb"))).as("c1"),
        qcosine(col("qb"), col("qa"), qnorm2(col("qb")), qnorm2(col("qa"))).as("c2"),
        qdotStatic(col("qa"), col("qb"), 4).as("ds"),
        qdot(col("qa"), col("qb")).as("dg"))
    val (c1, c2, ds, dg) = df.as[(Double, Double, Long, Long)].head()
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val ref = dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    assert(math.abs(c1 - ref) < 1e-5)
    assert(c1 == c2)
    assert(ds == dg) // unrolled == generic integer dot
  }
}
