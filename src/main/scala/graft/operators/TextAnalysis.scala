package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.Fns._

/** Text-analysis operators over `documents` — language ID, quality
  * scoring, token counting, document fingerprinting (north-star
  * extensions; the reference's only text op is WordCount, SURVEY.md
  * §2.1 S3/A6).
  *
  * Everything is a single scan → per-row column expressions → one
  * aggregation; no UDFs (all codegen-capable built-ins), no shuffles
  * beyond the final groupBy. Ratios are computed as ratios of exact
  * integer sums, never averages of per-row doubles, so results are
  * independent of partition/merge order at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (public, standard lists). The
    * heuristic is frequency-of-profile-hits; ties resolve in the fixed
    * priority order en > de > es > fr > zh (documented, deterministic). */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "mit", "den", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "se"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zhe", "na"))

  private def score(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words.map(lit(_)))))

  /** n-gram/stopword language ID vs the labelled `lang` column: emits
    * the confusion matrix (actual, predicted, n_docs). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val scored = Tables.documents(s, dir)
      .withColumn("toks", toks)
      .withColumns(stopwords.map { case (l, ws) => s"s_$l" -> score(col("toks"), ws) }.toMap)
    val Seq(en, de, es, fr, zh) = stopwords.map { case (l, _) => col(s"s_$l") }
    scored
      .withColumn("pred",
        when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred")
  }

  val langIdSql: String = {
    val scores = stopwords.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(w, t -> list_contains($list, t))) AS s_$l"
    }.mkString(",\n         ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |         $scores
       |  FROM toks),
       |pred AS (
       |  SELECT lang,
       |         CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |              WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |              WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |              WHEN s_fr >= s_zh THEN 'fr'
       |              ELSE 'zh' END AS pred
       |  FROM scored)
       |SELECT lang, pred, count(*) AS n_docs
       |FROM pred GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
  }

  /** Heuristic quality scoring: token count, mean word length (exact
    * integer arithmetic: chars minus internal spaces over tokens),
    * bucketed high/medium/low; aggregated per (source, bucket) with
    * ratio-of-sums averages. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_tok", size(tokens(col("text"))).cast(LongType))
      .withColumn("n_char", length(col("text")).cast(LongType))
      .withColumn("mean_wlen",
        (col("n_char") - col("n_tok") + 1).cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("quality",
        when(col("n_tok") >= 60 && col("mean_wlen") >= 4.0, "high")
          .when(col("n_tok") >= 25, "medium")
          .otherwise("low"))
      .groupBy(col("source"), col("quality"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tot_tokens"),
        // all-empty-doc group guard: Spark double/0 is NULL, DuckDB inf
        when(sum(col("n_tok")) > 0,
          sum(col("n_char") - col("n_tok") + 1).cast(DoubleType) /
            sum(col("n_tok")).cast(DoubleType)).as("avg_wlen"))
      .orderBy("source", "quality")

  val qualityScoreSql: String =
    """WITH d AS (
      |  SELECT source,
      |         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok,
      |         CAST(length(text) AS BIGINT) AS n_char
      |  FROM documents),
      |q AS (
      |  SELECT source, n_tok, n_char,
      |         CASE WHEN n_tok >= 60
      |                   AND CAST(n_char - n_tok + 1 AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 4.0
      |              THEN 'high'
      |              WHEN n_tok >= 25 THEN 'medium'
      |              ELSE 'low' END AS quality
      |  FROM d)
      |SELECT source, quality, count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS tot_tokens,
      |       CASE WHEN sum(n_tok) > 0
      |            THEN CAST(sum(n_char - n_tok + 1) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
      |            END AS avg_wlen
      |FROM q GROUP BY source, quality ORDER BY source, quality""".stripMargin

  /** Token counting two ways per source: whitespace tokens and a
    * BPE-ish regex segmentation (letter/digit runs + single symbols) —
    * the cheap token-budget estimator of a training-data pipeline. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    tokenCountFrom(Tables.documents(s, dir), tokens)

  /** The counting plan under the pluggable-tokenizer contract
    * ([[Pipeline.tokenChunksFrom]]'s `tokenizer` parameter): `ws_tok`
    * is whatever the plugged tokenizer yields (whitespace in the
    * oracle-gated default), `re_tok` stays the fixed BPE-ish regex
    * estimator the two-way comparison exists for. */
  private[graft] def tokenCountFrom(docs: DataFrame,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    docs
      .withColumn("ws_tok", size(tokenizer(col("text"))).cast(LongType))
      .withColumn("re_tok",
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast(LongType))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tok")).as("ws_tokens"),
        sum(col("re_tok")).as("re_tokens"),
        max(col("ws_tok")).as("max_doc_tokens"))
      .orderBy("source")

  val tokenCountSql: String =
    """WITH d AS (
      |  SELECT source,
      |         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tok,
      |         CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tok
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(ws_tok) AS BIGINT) AS ws_tokens,
      |       CAST(sum(re_tok) AS BIGINT) AS re_tokens,
      |       CAST(max(ws_tok) AS BIGINT) AS max_doc_tokens
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Rolling-hash document fingerprint: md5-derived hash of every char
    * 8-gram; the fingerprint is the minimum (winnowing with one global
    * window), plus the distinct-gram count. Per-row only — embarrassingly
    * parallel at any scale; fingerprint equality then drives near-dup
    * clustering exactly like [[Dedup.exactDedup]] on a weaker key. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(length(col("text")) >= 8)
      .withColumn("grams",
        transform(sequence(lit(1), length(col("text")) - 7),
          i => hash32(col("text").substr(i, lit(8)))))
      .select(col("doc_id"),
        array_min(col("grams")).as("fp"),
        size(array_distinct(col("grams"))).cast(LongType).as("n_grams"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         list_transform(generate_series(1, length(text) - 7),
      |           i -> CAST('0x' || substr(md5(substr(text, i, 8)), 1, 8) AS BIGINT)) AS grams
      |  FROM documents WHERE length(text) >= 8)
      |SELECT doc_id, list_min(grams) AS fp,
      |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_grams
      |FROM g ORDER BY doc_id""".stripMargin

  /** TF-IDF top terms per source: tf = term occurrences within the
    * source, df = number of sources containing the term, idf quantized
    * to the exact integer 1000000 div df so the score (tf · idf) and
    * therefore the ranking is pure BIGINT arithmetic — a float idf
    * (ln(N/df)) ranks identically but `ln` is not bit-specified across
    * engines, and a tie flipped by one ulp would break the oracle
    * hash. Top 5 per source, ties to the lexicographically first term.
    *
    * Scale: one explode scan → groupBy(source, term) with map-side
    * combine → tiny df aggregate joined back on term → per-source
    * top-k window over |sources|·|vocab| rows. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score", expr("tf * (1000000 div df)"))
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= 5)
      .select(col("source"), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
      .orderBy("source", "rnk")
  }

  val tfidfTopTermsSql: String =
    """WITH tk AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, count(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.source, tf.term, tf.tf, df.df,
      |         tf.tf * (1000000 // df.df) AS score
      |  FROM tf JOIN df USING (term)),
      |ranked AS (
      |  SELECT source, term, tf, df, score,
      |         CAST(row_number() OVER (PARTITION BY source
      |                                 ORDER BY score DESC, term) AS INT) AS rnk
      |  FROM scored)
      |SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |       CAST(score AS BIGINT) AS score, rnk
      |FROM ranked WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin

  /** The quality-filter FUNNEL every pretraining pipeline runs — three
    * sequential gates per document (language prediction matches the
    * label → token count ≥ 25 (q28's medium bar) → 3-gram repetition
    * rate < 20% (q62's Gopher rule)), rolled up per source as
    * survivors-after-each-stage. The operator exists to prove the
    * engine composes its scoring primitives into one decision pass:
    * everything (stopword scores, pred cascade, token/shingle counts)
    * is computed in a SINGLE per-partition loop over each document —
    * one scan, zero shuffle before the per-source rollup.
    *
    * All comparisons are exact-integer (`5·(n−nd) < n`, never a double
    * ratio), so Spark and the DuckDB oracle agree bit-for-bit. */
  def filterFunnel(s: SparkSession, dir: String): DataFrame =
    filterFunnelFrom(Tables.documents(s, dir))

  /** [[filterFunnel]] over an explicit docs relation — works unchanged
    * on a STREAMING DataFrame (stateless per-row gates + one
    * aggregation: run in complete output mode as a live quality
    * monitor; `FunnelSpec` proves stream/batch parity). */
  private val gateProfs: IndexedSeq[Set[String]] =
    stopwords.map { case (_, ws) => ws.toSet }.toIndexedSeq

  /** The per-document funnel decision — (lang_ok, qual_ok, rep_ok,
    * n_tokens) — shared by q73 and the q81 end-to-end pipeline so the
    * two queries gate identically by construction.
    *
    * The tie cascade is the same deterministic order as q27 / the SQL
    * CASE — including the null-text corner: SQL's scores are NULL
    * there (string_split(NULL)), so every WHEN is NULL and the ELSE
    * 'zh' branch wins; q27's when().otherwise("zh") does the same. An
    * empty/whitespace text is NOT null: zero scores, first branch,
    * 'en' in both engines. */
  private[graft] def gateFlags(lang: String, text: String): (Boolean, Boolean, Boolean, Int) = {
    val toks = if (text == null) Array.empty[String]
               else text.split(" ").filter(_.nonEmpty)
    val sc = gateProfs.map(ws => toks.count(ws.contains))
    val pred =
      if (text == null) "zh"
      else if (sc(0) >= sc(1) && sc(0) >= sc(2) && sc(0) >= sc(3) && sc(0) >= sc(4)) "en"
      else if (sc(1) >= sc(2) && sc(1) >= sc(3) && sc(1) >= sc(4)) "de"
      else if (sc(2) >= sc(3) && sc(2) >= sc(4)) "es"
      else if (sc(3) >= sc(4)) "fr"
      else "zh"
    val langOk = pred == lang
    val qualOk = toks.length >= 25
    val repOk = toks.length >= 3 && {
      val n = toks.length - 2
      val seen = new java.util.HashSet[String](n * 2)
      var i = 0
      while (i < n) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      5L * (n - seen.size) < n
    }
    (langOk, qualOk, repOk, toks.length)
  }

  private[graft] def filterFunnelFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("source"), col("lang"), col("text"))
      .as[(String, String, String)]
      .mapPartitions { it =>
        it.map { case (src, lang, text) =>
          val (langOk, qualOk, repOk, _) = gateFlags(lang, text)
          (src, langOk, langOk && qualOk, langOk && qualOk && repOk)
        }
      }.toDF("source", "lang_ok", "lq_ok", "kept")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("lq_ok"), 1L).otherwise(0L)).as("n_lang_qual"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        (sum(when(col("kept"), 1L).otherwise(0L)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("keep_rate"))
      .orderBy("source")
  }

  /** DuckDB fragments of the gate — the stopword scores (over a `w`
    * token-list column) and the tie cascade — shared by q73's oracle
    * and q81's, so the two oracles gate identically by construction. */
  private[graft] val gateScoresSql: String = stopwords.map { case (l, ws) =>
    val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(w, t -> list_contains($list, t))) AS s_$l"
  }.mkString(",\n         ")

  private[graft] val gateCaseSql: String = Seq(
    "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'",
    "     WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'",
    "     WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'",
    "     WHEN s_fr >= s_zh THEN 'fr'",
    "     ELSE 'zh' END").mkString("\n")

  val filterFunnelSql: String = {
    val scores = gateScoresSql
    s"""WITH toks AS (
       |  SELECT doc_id, source, lang, list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, source, lang, w,
       |         $scores
       |  FROM toks),
       |rep AS (
       |  SELECT doc_id,
       |         CAST(len(w) - 2 AS BIGINT) AS n,
       |         CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS BIGINT) AS nd
       |  FROM toks WHERE len(w) >= 3),
       |flags AS (
       |  SELECT s.source,
       |         (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |               WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |               WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |               WHEN s_fr >= s_zh THEN 'fr'
       |               ELSE 'zh' END) = s.lang AS lang_ok,
       |         len(s.w) >= 25 AS qual_ok,
       |         coalesce(5 * (r.n - r.nd) < r.n, FALSE) AS rep_ok
       |  FROM scored s LEFT JOIN rep r ON r.doc_id = s.doc_id)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       |       CAST(sum(CASE WHEN lang_ok AND qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_qual,
       |       CAST(sum(CASE WHEN lang_ok AND qual_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN lang_ok AND qual_ok AND rep_ok THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS keep_rate
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }

  /** q87: corpus-trained bigram LANGUAGE-MODEL quality scoring — the
    * CCNet/KenLM filtering shape (score each document by how probable
    * its text is under a model fit on the corpus itself; low scorers
    * are boilerplate/garble candidates). The model is a bigram MLE:
    * p(v|u) = c2(u,v) / c1(u) over all bigram occurrences, with each
    * conditional quantized to the exact integer (1000000·c2) div c1 —
    * the [[tfidfTopTerms]] convention: a float ln-perplexity ranks the
    * same but `ln` is not bit-specified across engines, while integer
    * micro-probabilities make Spark and the DuckDB oracle agree
    * bit-for-bit at any partitioning. A document's score is the
    * integer mean micro-probability over its bigram occurrences.
    *
    * Scale: one scan → explode to bigram occurrences → ONE exchange on
    * u (the repartition barrier): the per-doc occurrence rollup
    * (doc_id, u, v), the model tables c2 (u, v) and c1 (u), and the
    * score joins all reuse it — hashpartitioning(u) satisfies every
    * downstream clustering ([u] ⊆ [doc,u,v], [u,v], [u]), so nothing
    * re-shuffles until the final per-doc rollup. The model tables are
    * vocabulary-sized (≪ corpus — AQE broadcasts them when small). */
  def bigramLm(s: SparkSession, dir: String): DataFrame =
    bigramLmFrom(Tables.documents(s, dir))

  private[graft] def bigramLmFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // bigram emission is row-local text work — a tight partition loop,
    // not a transform/element_at lambda chain (higher-order array
    // functions evaluate interpreted per element; the
    // [[graft.operators.Dedup.shingleHashRowsFrom]] lesson — the SQL
    // formulation measured ~3x this loop on the explode stage alone)
    val occ = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = if (text == null) Array.empty[String]
                  else text.split(" ").filter(_.nonEmpty)
          if (w.length < 2) Iterator.empty
          else (0 until w.length - 1).iterator.map(i => (id, w(i), w(i + 1)))
        }
      }.toDF("doc_id", "u", "v")
      // explicit (vacuously true) null gate: the c2 join pushes
      // isnotnull(u, v) below the barrier but the c1 join only
      // isnotnull(u) — without one shared filter the three consumers'
      // pre-exchange subtrees canonicalize differently and AQE reuse
      // is lost (2 scans instead of 1; plan-pinned in PlanShapeSpec)
      .filter(col("u").isNotNull && col("v").isNotNull)
      .repartition(col("u"))
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(count(lit(1)).as("k"))
    val c2 = occ.groupBy(col("u"), col("v")).agg(sum(col("k")).as("c2"))
    val c1 = occ.groupBy(col("u")).agg(sum(col("k")).as("c1"))
    occ.join(c2, Seq("u", "v"))
      .join(c1, Seq("u"))
      .withColumn("micro", expr("k * ((1000000 * c2) div c1)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"), sum(col("micro")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val bigramLmSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |           i -> struct_pack(u := w[i], v := w[i+1]))) AS b
      |  FROM toks WHERE len(w) >= 2),
      |occ AS (SELECT doc_id, b.u AS u, b.v AS v, count(*) AS k FROM bg GROUP BY 1, 2, 3),
      |c2 AS (SELECT u, v, sum(k) AS c2 FROM occ GROUP BY 1, 2),
      |c1 AS (SELECT u, sum(k) AS c1 FROM occ GROUP BY 1),
      |scored AS (
      |  SELECT o.doc_id, sum(o.k * ((1000000 * c2.c2) // c1.c1)) AS s,
      |         sum(o.k) AS m
      |  FROM occ o JOIN c2 ON o.u = c2.u AND o.v = c2.v JOIN c1 ON o.u = c1.u
      |  GROUP BY o.doc_id)
      |SELECT doc_id, CAST(m AS BIGINT) AS n_bigrams, CAST(s // m AS BIGINT) AS score
      |FROM scored ORDER BY score DESC, doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q114: PII REDACTION (round-10 extension) — the scrubbing pass
  // every training-data pipeline runs before tokenization: find and
  // redact emails / phone numbers / IPv4 addresses, report per-source
  // detection counts, redaction rate and a checksum of the REDACTED
  // corpus. The synthetic corpus contains no PII-shaped tokens (no
  // digits, no '@' — verified), so the query PLANTS deterministic
  // md5-derived entities (the q110 analytic-oracle pattern): both
  // engines derive the same augmented text, and the hash gate then
  // proves the regex machinery — patterns, global replacement,
  // count extraction — byte-for-byte, since one mis-matched or
  // half-replaced entity flips the redacted-corpus checksum.
  // ------------------------------------------------------------------

  /** The three redaction patterns — deliberately identical strings on
    * both engines (Java regex and DuckDB's RE2 agree on this subset:
    * classes, bounded repeats, anchorless alternation-free atoms). */
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}-[0-9]{4}"
  private val IpPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** doc_id-gated planted entities, all derived from md5(text):
    * email `u<hex6>@ex<hex4>.com` when doc_id ≡ 0 (mod 3); phone
    * `+1-<d3>-<d4>-<d4>` when ≡ 0 (mod 4); IP `10.<o>.<o>.<o>`
    * (octets = hex-byte values, 0–255) when ≡ 1 (mod 5). */
  private def augmentedText: Column = {
    val h = md5(col("text"))
    def dec(start: Int, len: Int, mod: Long): Column =
      pmod(conv(substring(h, start, len), 16, 10).cast(LongType), lit(mod))
    def pad(c: Column, n: Int): Column = lpad(c.cast(StringType), n, "0")
    val email = concat(lit(" u"), substring(h, 1, 6), lit("@ex"),
      substring(h, 7, 4), lit(".com"))
    val phone = concat(lit(" +1-"), pad(dec(11, 3, 1000L), 3), lit("-"),
      pad(dec(14, 4, 10000L), 4), lit("-"), pad(dec(18, 4, 10000L), 4))
    val ip = concat(lit(" 10."), dec(22, 2, 256L), lit("."),
      dec(24, 2, 256L), lit("."), dec(26, 2, 256L))
    concat(col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0, email).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0, phone).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 1, ip).otherwise(lit("")))
  }

  def piiRedaction(s: SparkSession, dir: String): DataFrame = {
    val aug = augmentedText
    // redaction order matters only if patterns overlap — they cannot
    // (an email needs '@', a phone '+', an IP neither), so the three
    // global replaces compose order-independently; fixed order anyway
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(aug, EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      IpPat, "<IP>")
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(regexp_extract_all(aug, lit(EmailPat), lit(0))).as("ne"),
        size(regexp_extract_all(aug, lit(PhonePat), lit(0))).as("np"),
        size(regexp_extract_all(aug, lit(IpPat), lit(0))).as("ni"),
        hash32(red).as("rh"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ne")).cast(LongType).as("n_emails"),
        sum(col("np")).cast(LongType).as("n_phones"),
        sum(col("ni")).cast(LongType).as("n_ips"),
        (sum((col("ne") + col("np") + col("ni")).cast(LongType))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("pii_per_doc"),
        sum(col("rh")).as("redacted_checksum"))
      .orderBy("source")
  }

  /** DuckDB twin: same augmentation arithmetic, same patterns; the
    * only engine-syntax differences are conv → CAST('0x'…) and the
    * explicit 'g' flag (DuckDB's regexp_replace is first-match by
    * default where Spark's is global). */
  val piiRedactionSql: String = {
    val email = "' u' || substr(h, 1, 6) || '@ex' || substr(h, 7, 4) || '.com'"
    def dec(start: Int, len: Int, mod: Long): String =
      s"(CAST('0x' || substr(h, $start, $len) AS BIGINT) % $mod)"
    def pad(e: String, n: Int): String = s"lpad(CAST($e AS VARCHAR), $n, '0')"
    val phone = s"' +1-' || ${pad(dec(11, 3, 1000L), 3)} || '-' || " +
      s"${pad(dec(14, 4, 10000L), 4)} || '-' || ${pad(dec(18, 4, 10000L), 4)}"
    val ip = s"' 10.' || ${dec(22, 2, 256L)} || '.' || ${dec(24, 2, 256L)} || '.' || ${dec(26, 2, 256L)}"
    s"""WITH a AS (
       |  SELECT source, doc_id,
       |         text ||
       |         CASE WHEN doc_id % 3 = 0 THEN $email ELSE '' END ||
       |         CASE WHEN doc_id % 4 = 0 THEN $phone ELSE '' END ||
       |         CASE WHEN doc_id % 5 = 1 THEN $ip ELSE '' END AS aug
       |  FROM (SELECT source, doc_id, text, md5(text) AS h FROM documents) t),
       |r AS (
       |  SELECT source, doc_id,
       |         len(regexp_extract_all(aug, '$EmailPat')) AS ne,
       |         len(regexp_extract_all(aug, '$PhonePat')) AS np,
       |         len(regexp_extract_all(aug, '$IpPat')) AS ni,
       |         CAST('0x' || substr(md5(
       |           regexp_replace(regexp_replace(regexp_replace(aug,
       |             '$EmailPat', '<EMAIL>', 'g'),
       |             '$PhonePat', '<PHONE>', 'g'),
       |             '$IpPat', '<IP>', 'g')), 1, 8) AS BIGINT) AS rh
       |  FROM a)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(ne) AS BIGINT) AS n_emails,
       |       CAST(sum(np) AS BIGINT) AS n_phones,
       |       CAST(sum(ni) AS BIGINT) AS n_ips,
       |       CAST(sum(ne + np + ni) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS pii_per_doc,
       |       CAST(sum(rh) AS BIGINT) AS redacted_checksum
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

  /** q158: the INVERTED TEXT INDEX + conjunctive retrieval — the
    * boolean-search counterpart of the ANN family. The index is a
    * WRITTEN, term-bucketed postings table (term, doc_id, tf, df,
    * impact) with the integer impact tf·(N div df) denormalized in
    * (impact-ordered postings, the standard IR layout); queries are
    * CORPUS-DERIVED so both engines form the same set — the terms
    * ranked 5–20 by (df desc, term) paired into 8 two-term AND
    * queries. Execution is the real retrieval plan: a literal IN over
    * the bucketed term key (PLANNING-TIME bucket pruning — the
    * decision row pins SelectedBucketsCount ≤ 2-of-k for a point
    * lookup), a broadcast of the 16-row query map, one (qid, doc)
    * aggregate, and a per-query top-1 by (score desc, doc_id).
    *
    * Scale: postings build is one shuffle on (term, doc) + one on
    * term; the query side moves O(matched postings), reads only the
    * buckets holding query terms, and never ranks the vocabulary
    * globally (top-20 is a TakeOrdered — 20 rows to the driver). */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.Layout
    val n = Tables.documents(s, dir).count() // corpus size: one number
    val postings = Layout.materializedTable(s, dir, "invpostings",
        Some((Layout.Buckets, Seq("term")))) {
      val tf = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("term"), col("doc_id"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(dfc, Seq("term"))
        .withColumn("impact", col("tf") * expr(s"$n div df"))
    }
    val top = postings.groupBy(col("term")).agg(max(col("df")).as("df"))
      .orderBy(col("df").desc, col("term")).limit(20).collect()
    require(top.length >= 20, s"vocabulary too small: ${top.length} terms")
    val terms = top.map(_.getString(0))
    val qmap = (0 until 8).flatMap(i =>
      Seq((i.toLong, terms(4 + i)), (i.toLong, terms(12 + i))))
    val qterms = qmap.map(_._2)
    val hits = postings
      .filter(col("term").isin(qterms: _*)) // literal IN: bucket-pruned
      .join(broadcast(qmap.toDF("qid", "term")), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("nt"), sum(col("impact")).as("score"))
      .filter(col("nt") === 2) // conjunctive: both terms present
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    val per = hits.withColumn("rn", row_number().over(w))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"),
        max(when(col("rn") === 1, col("doc_id"))).as("top1_doc"),
        max(when(col("rn") === 1, col("score"))).as("top1_score"))
      .collect() // bounded: 8 queries
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // the point-lookup plan fact: a 2-term query reads ≤ 2 of the k
    // term buckets (collect, not head — AQE final plan)
    val probe = postings.filter(col("term").isin(terms(4), terms(12)))
      .groupBy(col("term")).agg(sum(col("impact")).as("m"))
      .agg(count(lit(1)).as("gn"))
    probe.collect()
    val pplan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val pruned = pplan.contains("Bucketed: true") &&
      "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(pplan)
        .exists(m => m.group(2).toInt == Layout.Buckets &&
          m.group(1).toInt <= 2)
    ((0 until 8).map { i =>
      val (h, d, sc) = per.getOrElse(i.toLong, (0L, -1L, 0L))
      (i.toLong, terms(4 + i), terms(12 + i), h, d, sc)
    } :+ ((99L, "zz_decision_point_lookup_pruned", "zz",
      if (pruned) 1L else 0L, 1L, 1L)))
      .toDF("qid", "term_a", "term_b", "n_hits", "top1_doc", "top1_score")
      .orderBy("qid")
  }

  /** The q158 oracle: postings, document frequencies, the ranked
    * query set and every conjunctive score re-derived in SQL; the
    * bucket-pruning decision predicted as a constant. */
  val invertedIndexSql: String = graft.operators.mat(
    """WITH tk AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT term, doc_id, count(*) AS tf FROM tk GROUP BY 1, 2),
      |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM documents),
      |rk AS (SELECT term, df,
      |         row_number() OVER (ORDER BY df DESC, term) AS r FROM dfc),
      |qa AS (SELECT r - 5 AS qid, term AS term_a FROM rk WHERE r BETWEEN 5 AND 12),
      |qb AS (SELECT r - 13 AS qid, term AS term_b FROM rk WHERE r BETWEEN 13 AND 20),
      |qt AS (SELECT qid, term_a AS term FROM qa
      |       UNION ALL SELECT qid, term_b FROM qb),
      |sc AS (
      |  SELECT q.qid, t.doc_id, count(*) AS nt,
      |         sum(t.tf * (nn.n // d.df)) AS score
      |  FROM qt q JOIN tf t ON q.term = t.term
      |       JOIN dfc d ON t.term = d.term CROSS JOIN nn
      |  GROUP BY 1, 2 HAVING count(*) = 2),
      |rkd AS (
      |  SELECT qid, doc_id, score,
      |         row_number() OVER (PARTITION BY qid
      |                            ORDER BY score DESC, doc_id) AS rn
      |  FROM sc),
      |per AS (
      |  SELECT qid, count(*) AS n_hits,
      |         max(CASE WHEN rn = 1 THEN doc_id END) AS top1_doc,
      |         max(CASE WHEN rn = 1 THEN score END) AS top1_score
      |  FROM rkd GROUP BY 1)
      |SELECT qid, term_a, term_b, n_hits, top1_doc, top1_score FROM (
      |  SELECT CAST(qa.qid AS BIGINT) AS qid, qa.term_a, qb.term_b,
      |         CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
      |         CAST(coalesce(p.top1_doc, -1) AS BIGINT) AS top1_doc,
      |         CAST(coalesce(p.top1_score, 0) AS BIGINT) AS top1_score
      |  FROM qa JOIN qb ON qa.qid = qb.qid LEFT JOIN per p ON qa.qid = p.qid
      |  UNION ALL
      |  SELECT CAST(99 AS BIGINT), 'zz_decision_point_lookup_pruned', 'zz',
      |         CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)) t
      |ORDER BY qid""".stripMargin)

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q27_lang_id", langId, Some(langIdSql)),
    QueryDef("q28_quality_score", qualityScore, Some(qualityScoreSql)),
    QueryDef("q29_token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("q30_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("q44_tfidf", tfidfTopTerms, Some(tfidfTopTermsSql)),
    QueryDef("q73_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    QueryDef("q87_bigram_lm", bigramLm, Some(bigramLmSql)),
    QueryDef("q114_pii_redaction", piiRedaction, Some(piiRedactionSql)),
    // q158: the inverted index + conjunctive retrieval — written
    // term-bucketed postings, corpus-derived query set, bucket-pruned
    // point lookups; every score raw-derived by the oracle
    QueryDef("q158_inverted_index", invertedIndex, Some(invertedIndexSql)),
  )
}
