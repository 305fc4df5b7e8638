package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Pipeline, TextAnalysis}

/** Round-9 item 4: the token-economy plans (q74 chunking, q75 packing,
  * q85 budget mix, q29 counting) are parameterized on a PLUGGABLE
  * tokenizer (`tokenizer: Column => Column`, text → token array) the
  * way q84's media dedup is parameterized on its fingerprint. This
  * spec proves the contract with a deterministic TOY BPE — a fixed
  * merge table applied greedily left-to-right over per-word character
  * splits, written entirely in Column expressions (no UDF, stays in
  * codegen) — by checking every plan's rollup against an independent
  * driver-side reference implementation of the same tokenizer and the
  * same chunk/pack/budget arithmetic over the collected corpus.
  *
  * Why a toy and not a real BPE: the merge-table MECHANISM is the real
  * algorithm (byte-pair merges in a fixed priority order); only the
  * table is toy-sized. A production vocab is a ~50k-row broadcast
  * table driving the same expression shape — plan-identical, which is
  * exactly what the contract is supposed to guarantee.
  */
class TokenizerPluggableSpec extends SparkSpec {
  import spark.implicits._

  // ---- The product's merge-table BPE (round-10: promoted from this
  // spec into Pipeline and gated as q109; the spec now checks the
  // PRODUCT tokenizer against its own independent driver reference,
  // so the two definitions cannot drift) ----

  private val Merges: Seq[(String, String)] = Pipeline.BpeMerges

  private val toyBpe: Column => Column = Pipeline.bpeTokenizer

  /** One word's tokenization (a space-free word passes through the
    * whitespace pre-tokenize unchanged), for the hand-check test. */
  private def bpeWord(w: Column): Column = toyBpe(w)

  // ---- Driver-side reference (independent arithmetic) ----

  private def bpeWordRef(w: String): List[String] =
    Merges.foldLeft(w.map(_.toString).toList) { case (toks, (a, b)) =>
      toks.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    }

  private def nTokRef(text: String): Long =
    text.split(" ").filter(_.nonEmpty).map(bpeWordRef(_).length.toLong).sum

  private def md5Hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, sfDir)

  private def collected: Seq[(String, Long, String)] =
    docs.select(col("source"), col("doc_id"), col("text"))
      .as[(String, Long, String)].collect().toSeq

  test("toy BPE merges hand-checkable words exactly") {
    val got = Seq("the", "and", "there", "in", "xyz")
      .toDF("w").select(bpeWord(col("w"))).as[Seq[String]].collect()
    // "the": t,h,e -> th,e -> the; "and": a,n,d -> an,d -> and;
    // "there": t,h,e,r,e -> th,e,r,e -> the,r,e (no e-r adjacency);
    // "in" merges by rule 3; "xyz" has no applicable rule
    assert(got(0) == Seq("the"))
    assert(got(1) == Seq("and"))
    assert(got(2) == Seq("the", "r", "e"))
    assert(got(3) == Seq("in"))
    assert(got(4) == Seq("x", "y", "z"))
    // and the Column form agrees with the driver reference on them
    assert(got.toSeq == Seq("the", "and", "there", "in", "xyz").map(bpeWordRef))
  }

  test("q74 chunking plan under the toy BPE equals the driver reference") {
    val ChunkLen = 50L; val ChunkStride = 40L
    def chunksOf(n: Long): Long =
      if (n <= ChunkLen) 1L else 1L + (n - ChunkLen + ChunkStride - 1) / ChunkStride
    def chunkToks(n: Long): Long =
      (0L until chunksOf(n)).map(i => math.min(ChunkLen, n - i * ChunkStride)).sum
    val ref = collected.map { case (src, _, t) => (src, nTokRef(t)) }
      .filter(_._2 > 0)
      .groupBy(_._1).map { case (src, rows) =>
        val ns = rows.map(_._2)
        (src, ns.size.toLong, ns.sum, ns.map(chunksOf).sum, ns.map(chunkToks).sum)
      }.toSeq.sortBy(_._1)
    val got = Pipeline.tokenChunksFrom(docs, toyBpe)
      .select("source", "n_docs", "raw_tokens", "n_chunks", "chunk_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("q75 packing plan under the toy BPE equals the driver reference") {
    val Bin = 512L
    val ref = collected.map { case (src, id, t) => (src, id, nTokRef(t)) }
      .filter(_._3 > 0)
      .groupBy(_._1).map { case (src, rows) =>
        val ordered = rows.sortBy(_._2)
        val ends = ordered.map(_._3).scanLeft(0L)(_ + _).tail
        val splits = ordered.map(_._3).zip(ends).count { case (n, e) =>
          (e - n) / Bin != (e - 1) / Bin
        }
        val tot = ordered.map(_._3).sum
        (src, ordered.size.toLong, tot, (tot + Bin - 1) / Bin, splits.toLong)
      }.toSeq.sortBy(_._1)
    val got = Pipeline.sequencePackingFrom(docs, toyBpe)
      .select("source", "n_docs", "total_tokens", "n_bins", "n_split_docs")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("q85 budget-mix plan under the toy BPE equals the driver reference") {
    val Budget = 5000L
    val ref = collected.map { case (src, id, t) => (src, id, t, nTokRef(t)) }
      .filter(_._4 > 0)
      .groupBy(_._1).flatMap { case (src, rows) =>
        val ordered = rows.sortBy(r => (md5Hash60(r._3), r._2))
        val kept = ordered.map(_._4).scanLeft(0L)(_ + _).tail
          .zip(ordered).takeWhile(_._1 <= Budget).map(_._2)
        if (kept.isEmpty) None
        else Some((src, kept.size.toLong, kept.map(_._4).sum,
          Budget - kept.map(_._4).sum))
      }.toSeq.sortBy(_._1)
    val got = Pipeline.tokenBudgetMixFrom(docs, toyBpe)
      .select("source", "n_docs_kept", "tokens_kept", "budget_left")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("q29 counting plan under the toy BPE equals the driver reference") {
    val ref = collected.map { case (src, _, t) => (src, nTokRef(t)) }
      .groupBy(_._1).map { case (src, rows) =>
        (src, rows.size.toLong, rows.map(_._2).sum, rows.map(_._2).max)
      }.toSeq.sortBy(_._1)
    val got = TextAnalysis.tokenCountFrom(docs, toyBpe)
      .select("source", "n_docs", "ws_tokens", "max_doc_tokens")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("the whitespace default is exactly the oracle-gated plan") {
    val viaDefault = Pipeline.tokenChunks(spark, sfDir).collect().map(_.toString).toSeq
    val viaContract = Pipeline
      .tokenChunksFrom(docs, graft.functions.Fns.tokens)
      .collect().map(_.toString).toSeq
    assert(viaDefault == viaContract && viaDefault.nonEmpty)
  }
}
