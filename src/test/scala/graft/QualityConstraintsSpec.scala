package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline

/** q157 — the declarative data-quality constraint suite: a clean run
  * (all green on the synthetic corpus) and a deterministically
  * corrupted run whose violation counts are re-derived here from the
  * raw rows in plain Scala (independent of both the engine's and the
  * oracle's SQL derivations). */
class QualityConstraintsSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.qualityConstraints(spark, sfDir).collect()

  private def row(run: String, rule: String): Row =
    out.find(r => r.getString(0) == run && r.getString(1) == rule).get

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text", "lang", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("clean run: every constraint passes with zero violations") {
    Seq("nn_text", "range_n_chars", "lang_domain", "len_consistency",
      "unique_doc_id", "ri_orders").foreach { c =>
      val r = row("clean", c)
      assert(r.getLong(3) == 0L && r.getLong(4) == 1L, s"clean $c: $r")
    }
  }

  test("corrupted run: violation counts match a raw-row re-derivation") {
    // the corruption, replayed in plain Scala
    case class D(id: Long, text: Option[String], lang: String, nc: Long)
    val mutated = docs.map { case (id, t, l, nc) =>
      D(id,
        if (id % 41 == 3) None else Option(t),
        if (id % 43 == 7) "xx" else l,
        if (id % 37 == 5) -nc - 1 else nc)
    }
    val all = mutated ++ mutated.filter(_.id % 29 == 11)
    assert(row("corrupted", "nn_text").getLong(3) ==
      all.count(_.text.isEmpty))
    assert(row("corrupted", "range_n_chars").getLong(3) ==
      all.count(_.nc < 0))
    assert(row("corrupted", "lang_domain").getLong(3) ==
      all.count(d => !Set("de", "en", "es", "fr", "zh").contains(d.lang)))
    assert(row("corrupted", "len_consistency").getLong(3) ==
      all.count(d => d.text.exists(t => t.length != d.nc)))
    assert(row("corrupted", "unique_doc_id").getLong(3) ==
      (all.length - all.map(_.id).distinct.length))
    assert(row("corrupted", "nn_text").getLong(2) == all.length.toLong,
      "checked must count the corrupted relation (incl. duplicates)")
    // at least one planted class must actually fire at this SF, or
    // the gate degenerates to all-zeros
    assert(Seq("nn_text", "range_n_chars", "lang_domain", "unique_doc_id")
      .map(c => row("corrupted", c).getLong(3)).sum > 0)
  }

  test("referential integrity: orphan count equals the removed-dim slice") {
    val liKeys = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val expected = liKeys.count(_ % 31 == 2)
    val r = row("corrupted", "ri_orders")
    assert(r.getLong(3) == expected && r.getLong(2) == liKeys.length.toLong)
    assert(expected > 0, "the planted RI violation must fire at this SF")
  }

  test("cost shape: one scan clean, two scans corrupted (never per-rule)") {
    assert(row("clean", "zz_single_pass").getLong(2) == 1L)
    assert(row("clean", "zz_single_pass").getLong(4) == 1L)
    assert(row("corrupted", "zz_single_pass").getLong(2) == 2L)
    assert(row("corrupted", "zz_single_pass").getLong(4) == 1L)
  }
}
