package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The stream→storage leg of the table lifecycle: a live event stream
  * lands in the SAME date-partitioned parquet layout the batch writer
  * produces (`sources.Layout`), so everything proven about that layout
  * — day pruning at scan time, pure-append new days, the q17/q32-shape
  * rollups — holds for data that arrived on a stream.
  *
  * Uses Spark's NATIVE streaming file sink (not foreachBatch): each
  * micro-batch appends day-partitioned parquet files, and the sink's
  * `_spark_metadata` commit log records exactly which files belong to
  * committed batches — so a crashed/restarted query never double-counts
  * a partially-written batch (exactly-once file output, the guarantee a
  * hand-rolled foreachBatch append would have to rebuild itself).
  *
  * 100 TB notes: the sink appends ~one file per partition per trigger —
  * file-count growth is trigger-rate-bounded, and the standing answer
  * is the SAME compaction job the batch increments use
  * ([[graft.sources.Layout.compactBucketed]] for bucketed facts; a
  * day-partition rewrite for this layout). Day derives from the event
  * time column, so late events land in their OWN (old) day partition —
  * append-correct without dynamic overwrite; replacing a corrected day
  * wholesale stays a batch job (`Layout.incrementalEvents`' dynamic
  * partition overwrite). `StreamingSpec` proves stream-written ==
  * batch-written rows, that day pruning fires on the re-read, and the
  * recovery contract itself: a query killed between triggers and
  * restarted from its checkpoint emits every row exactly once, and a
  * torn file from an uncommitted batch is invisible to readers (the
  * `_spark_metadata` log, exercised, not assumed). */
object LayoutSink {

  /** Start an append-mode query writing (event-time day)-partitioned
    * parquet under `path`, exactly-once via the file-sink commit log
    * at `checkpoint`. */
  def eventsToLayout(events: DataFrame, path: String,
                     checkpoint: String): StreamingQuery =
    events
      .withColumn("day", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .outputMode("append")
      .start()
}
