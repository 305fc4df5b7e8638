package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** The native QDot expression must agree exactly with the two pure-SQL
  * formulations on every input, in both codegen and interpreted modes,
  * and reject wrong types at analysis time. */
class QDotSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val rows: Seq[(Array[Long], Array[Long])] =
    Seq.fill(200)((Array.fill(64)(rnd.nextLong(2000001) - 1000000L),
      Array.fill(64)(rnd.nextLong(2000001) - 1000000L)))

  test("qdot_native == aggregate/zip_with qdot == unrolled qdotStatic") {
    val df = rows.toDF("a", "b")
      .select(
        qdotNative(col("a"), col("b")).as("native"),
        qdot(col("a"), col("b")).as("hof"),
        qdotStatic(col("a"), col("b"), 64).as("unrolled"))
    assert(df.filter(col("native") =!= col("hof") ||
      col("native") =!= col("unrolled")).count() == 0)
  }

  test("interpreted eval matches codegen result") {
    val expected = rows.map { case (a, b) => a.zip(b).map(t => t._1 * t._2).sum }
    // force the interpreted path via the expression's eval
    val got = rows.map { case (a, b) =>
      graft.functions.QDot(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[Long]
    }
    assert(got == expected)
  }

  test("null array yields null; length mismatch uses the shorter prefix") {
    val df = Seq(
      (Some(Array(1L, 2L, 3L)), Some(Array(4L, 5L))),
      (None: Option[Array[Long]], Some(Array(1L))),
    ).toDF("a", "b").select(qdotNative(col("a"), col("b")).as("d"))
    val got = df.as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(1L * 4 + 2 * 5), None))
  }

  test("null ELEMENT propagates to null, matching the HOF form") {
    val got = spark.sql(
      "SELECT qdot_native(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L)) AS d")
      .as[Option[Long]].collect().head
    assert(got.isEmpty) // not 1 — a null slot must not read as garbage/0
    val hof = spark.sql(
      """SELECT aggregate(zip_with(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L),
        |  (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d""".stripMargin)
      .as[Option[Long]].collect().head
    assert(got == hof)
  }

  test("wrong argument types are rejected at analysis time") {
    intercept[AnalysisException] {
      Seq(("x", 1L)).toDF("a", "b")
        .select(qdotNative(col("a"), col("b"))).collect()
    }
  }

  test("usable from SQL (registered via SparkSessionExtensions)") {
    val one = spark.sql(
      "SELECT qdot_native(array(1L, 2L), array(3L, 4L)) AS d")
      .as[Long].collect().head
    assert(one == 11L)
  }
}
