package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Fns._

/** One admission-score row per arriving document (the q103 columns). */
case class SpanCoverage(doc_id: Long, nw: Long, known_windows: Long, coverage: Double)

/** The streaming front door of the dedup family — q43's incremental
  * exact dedup as an INGEST-time operator: documents arriving on a
  * stream are admitted only if their normalized-text hash is (a) not
  * already in the standing corpus and (b) not already seen earlier in
  * the stream (replays, re-crawls).
  *
  * One definition serves batch and streaming (`DataFrame` in, the
  * engine decides): on a streaming input, `dropDuplicates` keeps the
  * first-per-hash across ALL triggers (state store), and the corpus
  * check is a stream-static LEFT ANTI join — both append-mode
  * compatible, so admitted documents flow out exactly once.
  * `StreamingSpec` proves stream == batch on identical rows, that
  * trigger boundaries never change the admitted set, and that the
  * replay state SURVIVES a kill/restart: a query resumed from its
  * checkpoint rejects a replay of a pre-crash admission (recovered
  * state store) while admitting fresh documents — exactly-once
  * across process lifetimes, not just across triggers.
  *
  * 100 TB notes: the 60-bit hash key makes the state store and the
  * anti join carry 8-byte keys, never document bodies (the q43
  * argument); the corpus side is pre-distinct so the static relation
  * is one row per unique text. Unbounded streams should bound the
  * replay state with `dropDuplicatesWithinWatermark` once a re-crawl
  * horizon is known — the state then holds one hash per IN-HORIZON
  * document instead of forever; the corpus anti join is the backstop
  * for older dups (at scale: a bucketed corpus-hash table, q79's
  * layout machinery). */
object DocIngest {

  /** Replay-suppression horizon of the index/media doors (round-10
    * advice: their `dropDuplicates` state otherwise grows without
    * bound over the stream's lifetime — an unbounded-memory door at
    * the 100 TB ingest framing). 24 h of INGEST time: re-deliveries
    * cluster within hours of the original (source retries, crawler
    * re-queues), so the state holds one key per in-horizon arrival
    * instead of one per all-time arrival; an older replay re-emits
    * and is reconciled by the idempotent index write (first-write-
    * wins under the held quantizer). */
  private val ReplayHorizon = "24 hours"

  /** Bounded-state replay suppression: on a STREAM, watermarked
    * `dropDuplicatesWithinWatermark` over ingest time (state evicted
    * past [[ReplayHorizon]]); on a batch frame, plain dropDuplicates
    * (no state to bound — and the batch==stream parity specs replay
    * well inside the horizon). The ingest-time column never leaves
    * the operator. */
  private def dedupBounded(df: DataFrame, keys: String*): DataFrame =
    if (df.isStreaming)
      df.withColumn("ingest_ts", current_timestamp())
        .withWatermark("ingest_ts", ReplayHorizon)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
        .drop("ingest_ts")
    else df.dropDuplicates(keys.toSeq)

  def dedupedIngest(incoming: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusHashes = corpus
      .select(hash60(normText(col("text"))).as("nh")).distinct()
    // ORDER MATTERS (round-9 item 7): the corpus anti join runs BEFORE
    // the replay-dedup, so corpus-rejected texts never enter the state
    // store. With the reverse order a text rejected because the corpus
    // held it would sit in dropDuplicates state FOREVER — and after a
    // takedown deletes that document from the corpus, a restarted
    // stream would keep rejecting legitimate re-submissions from stale
    // state instead of letting the POST-delete index decide
    // (`DeleteStreamingSpec` pins both directions). Replay state now
    // also holds one hash per ADMITTED document only — strictly
    // smaller state at any scale.
    incoming
      .withColumn("nh", hash60(normText(col("text"))))
      .join(corpusHashes, Seq("nh"), "left_anti")
      .dropDuplicates("nh")
  }

  /** SEMANTIC ingest — q91's incremental semantic dedup as the stream
    * front door, completing the modality set (exact: [[dedupedIngest]],
    * MinHash: [[nearDupIngest]], embeddings: this): each arriving
    * embedding quantizes and routes itself against the broadcast
    * corpus quantizer — stateless, O(micro-batch) per trigger — and
    * joins the STATIC corpus assignment (in production the written,
    * cent_id-bucketed `graft_ivfassignbase` table), so the standing
    * corpus is never re-assigned or re-shuffled by the stream. Output:
    * (vec_id, cvec, cos) semantic-match events at cosine ≥ 0.4,
    * append mode; match identity (vec_id, cvec) is `dropDuplicates`
    * state, so replays and re-crawls emit each match exactly once
    * across triggers. `StreamingSpec` proves stream == batch across
    * trigger splits incl. a cross-trigger replay, and that the match
    * state survives a kill/restart from checkpoint (a post-restart
    * replay of a pre-crash match is not re-emitted). */
  def semanticIngest(incoming: DataFrame,
                     cents: Array[(Long, Array[Long], Long)],
                     corpusAssign: DataFrame): DataFrame =
    graft.operators.Similarity.semanticMatchEvents(incoming, cents, corpusAssign)
      .dropDuplicates("vec_id", "cvec")

  /** SPAN-coverage ingest — q103 as the stream front door, the FOURTH
    * modality (exact / MinHash / semantic / span): each arriving
    * document windows only itself (map-side, O(micro-batch)), left-
    * joins the STATIC known-window set (in production the written
    * h-bucketed `graft_winindex` distinct-projected), and a
    * `flatMapGroupsWithState` over doc_id rolls the flags into one
    * coverage row per document — the custom-state formulation, since
    * a streaming groupBy would demand a watermark these rows don't
    * have, and a document's windows always share a trigger. The
    * GroupState doubles as replay suppression: a doc_id seen in an
    * earlier trigger emits nothing again (exactly-once per doc across
    * triggers and, via the checkpointed state store, across process
    * lifetimes); in-trigger duplicate rows collapse via per-group
    * distinct. The same code path runs on a BATCH frame (state always
    * absent) — `StreamingSpec` proves stream == batch and the restart
    * round-trip. */
  def spanIngest(incoming: DataFrame,
                 corpusWindows: DataFrame): Dataset[SpanCoverage] = {
    val s = incoming.sparkSession
    import s.implicits._
    val known = corpusWindows.select(col("h")).distinct().withColumn("present", lit(1))
    graft.operators.Dedup.windowTable(incoming)
      .join(known, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        coalesce(col("present"), lit(0)).as("present"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, SpanCoverage](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (doc, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val rs = rows.toArray.distinct // in-trigger replay: same (doc,h,flag) rows
            val knownN = rs.count(_._3 == 1).toLong
            Iterator.single(
              SpanCoverage(doc, rs.length.toLong, knownN, knownN.toDouble / rs.length))
          }
      }
  }

  /** VECTOR-INDEX ingest — q108's O(batch) ANN index maintenance as
    * the FIFTH stream front door (exact / MinHash / semantic / span /
    * INDEX): each arriving embedding quantizes, routes itself against
    * the broadcast HELD quantizer (nearest cell), and encodes its
    * residual PQ codes map-side — stateless, O(micro-batch) per
    * trigger, the standing corpus and the written index are never
    * touched. Output rows carry exactly the `ivfpqbase` index schema
    * (vec_id, cent_id, codes), so the stream composes directly with
    * the layout sink / [[graft.sources.Layout.appendRewrite]] — the
    * streaming form of the q108 append. Replay suppression on vec_id
    * (`dropDuplicates` state: an index entry is immutable under the
    * held quantizer, so first-write-wins IS the right merge), append
    * mode. `StreamingSpec` proves stream == batch across trigger
    * splits with a cross-trigger replay, AND that the door's rows are
    * byte-identical to what the BATCH append (q108) published into the
    * maintained `ivfpqbase` table for the same vectors — the stream
    * and batch maintenance paths provably write the same index. */
  def indexIngest(incoming: DataFrame,
                  cents: Array[(Long, Array[Long], Long)],
                  resCodebook: Array[(Long, Array[Long])]): DataFrame = {
    val s = incoming.sparkSession
    import s.implicits._
    import graft.operators.Similarity
    val centById = cents.map(c => (c._1, c._2)).toMap
    val bcC = s.sparkContext.broadcast(cents)
    val bcCm = s.sparkContext.broadcast(centById)
    val bcR = s.sparkContext.broadcast(resCodebook)
    Similarity.quantizedFrom(incoming)
      .select(col("vec_id"), col("q"), col("qn")).as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cs = bcC.value; val cm = bcCm.value; val rc = bcR.value
        it.map { case (id, q, qn) =>
          val cid = Similarity.routeCents(q, qn, cs, 1).head
          val cq = cm(cid)
          (id, cid,
            Similarity.pqEncode(
              Array.tabulate(Similarity.Dim)(i => q(i) - cq(i)), rc).toSeq)
        }
      }.toDF("vec_id", "cent_id", "codes")
      .transform(dedupBounded(_, "vec_id"))
  }

  /** MEDIA ingest — the multimodal modality's front door: arriving
    * binary blobs decode through the REAL codec
    * ([[graft.operators.Multimodal.ppmDecode]] → [[graft.functions.Ppm]])
    * inside the stream — stateless mapPartitions, the production
    * shape (per-partition codec init, corrupt blobs skip-and-count as
    * `ok = false` rows rather than throwing a task) — with replay
    * suppression on media_id. Output rows carry the decode-features
    * schema incl. the real average-hash, so the stream composes
    * directly with the q111 banding dedup or a layout sink.
    * `StreamingSpec` proves stream == batch across trigger splits
    * with a replay, corrupt blobs included. */
  def mediaIngest(incoming: DataFrame): DataFrame =
    dedupBounded(graft.operators.Multimodal.ppmDecode(incoming).toDF(), "media_id")

  /** NEAR-dup ingest — q77's incremental MinHash-LSH as the stream
    * front door: each arriving document is signed in the stream
    * (map-side band table over the micro-batch) and band-joined
    * against the standing corpus band index (a STATIC relation — in
    * production the written, bucketed `graft_bandindex` table), so
    * every trigger does O(micro-batch) work and the corpus is never
    * re-signed or re-shuffled. Output: (doc_new, doc_corpus, n_eq,
    * est_j) near-dup hits, append mode (pair identity is
    * `dropDuplicates` state, exactly-once across triggers; the q77
    * sort is omitted — a total order is illegal on an unaggregated
    * stream and meaningless for an admission signal).
    * `StreamingSpec` proves stream == batch across trigger splits AND
    * across a kill/restart: the pair state recovers from the
    * checkpoint, so a replayed pair is suppressed while new
    * near-copies land exactly once. */
  def nearDupIngest(incoming: DataFrame, corpusBands: DataFrame,
                    bucketCap: Int = graft.operators.Dedup.MaxLshBucket): DataFrame =
    graft.operators.Dedup.incrementalPairs(
      graft.operators.Dedup.bandTable(incoming), corpusBands, bucketCap)
}
