package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract, as an invariant instead of a
  * calibration: the driver captures a ~2,000-char stdout tail and
  * parses it line-wise from the end, so the LAST line [[BenchReport]]
  * prints must always be a complete, independently-parseable JSON
  * object under [[BenchReport.MaxLastLineChars]] — for ANY query-set
  * size. Rounds 1–3 and round 5 each lost their bench record to a
  * violation of exactly this; no Spark session involved here, so the
  * spec runs in milliseconds. */
class BenchTailSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def synthetic(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_operator_name" -> (0.001 * i + 0.1)))

  private def check(n: Int): Unit = {
    val lines = BenchReport.lines(synthetic(n), passes = 3,
      sfDir = "/root/testdata/sf0.1", setupSec = 12.345)
    assert(lines.size == 2)
    val last = lines.last
    assert(last.length < BenchReport.MaxLastLineChars,
      s"n=$n: last line ${last.length} chars >= ${BenchReport.MaxLastLineChars}")
    val node = mapper.readTree(last) // throws on malformed JSON
    assert(node.get("metric").asText() == "total")
    assert(node.has("value") && node.get("value").isNumber)
    assert(node.has("setup_sec") && node.get("setup_sec").isNumber)
    // the skew-cap tripwire count rides in both forms: 0 is the
    // oracle-gate-safe state, >0 flags a capped (oracle-divergent) run
    assert(node.has("caps_fired") && node.get("caps_fired").asLong() == 0L)
    // queries_inline tells the consumer which form it parsed, and must
    // agree with the actual presence of the per-query map.
    assert(node.get("queries_inline").asBoolean() == node.has("queries"))
    // the self-adjudication fields (round-15): control_sec and the
    // control-normalized total ride EVERY stdout form — synthetic
    // sets without the control query pin the no-control sentinel
    assert(node.get("control_sec").asDouble() == -1.0)
    assert(node.get("total_norm").asDouble() == -1.0)
    // Every printed line must be parseable on its own (the full line,
    // wherever it lands in the stream, is still consumed from logs).
    lines.foreach(l => mapper.readTree(l))
  }

  test("last line fits the tail budget at 79, 120, and 200 queries") {
    Seq(79, 120, 200).foreach(check)
  }

  test("last line fits at every size 1..250 (sweep across the cutover)") {
    (1 to 250).foreach(check)
  }

  test("small query sets keep the rich per-query form last") {
    val lines = BenchReport.lines(synthetic(10), 3, "/root/testdata/sf0.01", 0.0)
    val node = mapper.readTree(lines.last)
    assert(node.get("queries_inline").asBoolean())
    assert(node.get("queries").size() == 10)
  }

  test("at 79 real-shaped queries the full line no longer fits and the short form is last") {
    // Round 5's regression shape: ~2,074-char full line vs a 2,000-char
    // buffer. With realistic name lengths the renderer must cut over to
    // short-form-last rather than gamble on the buffer.
    val lines = BenchReport.lines(synthetic(79), 3, "/root/testdata/sf0.1", 5.0)
    val node = mapper.readTree(lines.last)
    assert(!node.get("queries_inline").asBoolean())
    assert(node.has("value"))
    // The full line still rides earlier in the stream, parseable from logs.
    val fullNode = mapper.readTree(lines.head)
    assert(fullNode.get("queries_inline").asBoolean())
    assert(fullNode.get("queries").size() == 79)
  }

  test("totals and per-query values agree between the two forms") {
    val rs = synthetic(42)
    val Seq(a, b) = BenchReport.lines(rs, 5, "/tmp/x", 1.5).map(mapper.readTree)
    assert(a.get("value").asDouble() == b.get("value").asDouble())
    assert(a.get("passes").asInt() == 5 && b.get("passes").asInt() == 5)
  }

  test("a fired cap count is carried verbatim in both forms") {
    val Seq(a, b) = BenchReport.lines(synthetic(12), 3, "/tmp/x", 0.0, capsFired = 2L)
      .map(mapper.readTree)
    assert(a.get("caps_fired").asLong() == 2L && b.get("caps_fired").asLong() == 2L)
  }

  test("stdout lines carry control_sec and the control-normalized total") {
    // host-drift adjudication from the tail alone (round-14 item 4):
    // with the control present, both stdout forms expose its seconds
    // and total/control — a uniform host factor moves value but not
    // total_norm
    val rs = Seq(
      BenchReport.ControlQuery -> 0.25,
      "q07_priority_revenue" -> 0.75,
      "q96_ann_recall" -> 2.0)
    val nodes = BenchReport.lines(rs, 5, "/tmp/x", 1.0).map(mapper.readTree)
    nodes.foreach { n =>
      assert(n.get("control_sec").asDouble() == 0.25)
      assert(n.get("total_norm").asDouble() == 12.0) // 3.0 / 0.25
    }
    // and the table artifact carries the identical values (one
    // headFields rendering — the two consumers cannot drift)
    val t = mapper.readTree(BenchReport.tableJson(rs, 5, "/tmp/x", 1.0, 0L))
    assert(t.get("control_sec").asDouble() == 0.25)
    assert(t.get("total_norm").asDouble() == 12.0)
  }

  test("table artifact carries the control time and control-normalized ratios") {
    val rs = Seq(
      BenchReport.ControlQuery -> 0.25,
      "q07_priority_revenue" -> 0.75,
      "q96_ann_recall" -> 2.0,
      "q99_failed" -> -1.0)
    val node = mapper.readTree(BenchReport.tableJson(rs, 3, "/tmp/x", 30.0, 0L))
    assert(node.get("control").asText() == BenchReport.ControlQuery)
    assert(node.get("control_sec").asDouble() == 0.25)
    val norm = node.get("queries_norm")
    assert(norm.get(BenchReport.ControlQuery).asDouble() == 1.0)
    assert(norm.get("q07_priority_revenue").asDouble() == 3.0)
    assert(norm.get("q96_ann_recall").asDouble() == 8.0)
    // failed executions stay pinned at -1 in both forms
    assert(norm.get("q99_failed").asDouble() == -1.0)
    assert(node.get("queries").get("q99_failed").asDouble() == -1.0)
    // a run whose control itself failed emits no normalized map at all
    // rather than ratios against a bogus denominator
    val noCtl = mapper.readTree(BenchReport.tableJson(
      Seq("q07_priority_revenue" -> 0.75), 3, "/tmp/x", 0.0, 0L))
    assert(noCtl.get("control_sec").asDouble() == -1.0)
    assert(noCtl.get("queries_norm").size() == 0)
  }

  test("table artifact carries per-query noise bands and per-table setup times") {
    val rs = Seq(
      BenchReport.ControlQuery -> 0.25,
      "q07_priority_revenue" -> 0.75,
      "q99_failed" -> -1.0)
    val spread = Map(
      BenchReport.ControlQuery -> (0.24, 0.31),
      "q07_priority_revenue" -> (0.7, 0.9))
    // q99_failed has NO band (every pass failed) — it must be absent
    // from the maps, not rendered as a bogus [-1, -1]
    val node = mapper.readTree(BenchReport.tableJson(rs, 5, "/tmp/x", 30.0, 0L,
      spread, Seq("dedup_shared" -> 12.5, "similarity_shared" -> 17.5)))
    assert(node.get("queries_lo").get(BenchReport.ControlQuery).asDouble() == 0.24)
    assert(node.get("queries_hi").get(BenchReport.ControlQuery).asDouble() == 0.31)
    assert(node.get("queries_lo").get("q07_priority_revenue").asDouble() == 0.7)
    assert(node.get("queries_hi").get("q07_priority_revenue").asDouble() == 0.9)
    assert(!node.get("queries_lo").has("q99_failed"))
    assert(!node.get("queries_hi").has("q99_failed"))
    assert(node.get("setup_tables").get("dedup_shared").asDouble() == 12.5)
    assert(node.get("setup_tables").get("similarity_shared").asDouble() == 17.5)
    // band median must sit inside its own band for every banded query
    rs.filter(r => spread.contains(r._1)).foreach { case (q, med) =>
      val (lo, hi) = spread(q)
      assert(lo <= med && med <= hi)
    }
  }
}
