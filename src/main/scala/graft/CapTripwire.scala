package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Tripwire for the skew caps during oracle-gated runs.
  *
  * Every skew cap in the engine (LSH bucket, shingle/containment df,
  * window df, media band, semantic cluster) is an `observe` node named
  * `graft.cap(...)` that records how many buckets/rows it excluded.
  * The caps are sized to NEVER fire on well-behaved corpora — but if a
  * future gated corpus ever grows one bucket past a cap, the capped
  * Spark result silently diverges from the uncapped SQL oracle and the
  * gate reports an opaque hash mismatch. This listener turns that
  * failure mode into an explicit, attributable signal: [[Verify]]
  * SKIPS (deletes the dump of) any query whose execution fired a cap,
  * and [[Bench]] reports a `caps_fired` count in its JSON line.
  *
  * QueryExecutionListener events post asynchronously on the listener
  * bus, so consumers drain with a short settle wait after each action;
  * attribution is therefore best-effort per query, but the END-of-run
  * total is exact (nothing is ever removed except by [[drain]]).
  */
final class CapTripwire extends QueryExecutionListener {
  private val fired = new ConcurrentLinkedQueue[String]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith("graft.cap(")) {
        // schema is (hot_count, excluded_sum) with site-specific field
        // names — any positive value means the cap excluded data
        val vals = (0 until row.length).map(i => row.getLong(i))
        if (vals.exists(_ > 0L))
          fired.add(s"$name ${row.schema.fieldNames.zip(vals).map { case (f, v) => s"$f=$v" }.mkString(" ")}")
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

  /** Remove and return everything observed so far (after a settle wait
    * for the async listener bus). */
  def drain(settleMs: Long = 50L): Seq[String] = {
    Thread.sleep(settleMs)
    Iterator.continually(fired.poll()).takeWhile(_ != null).toSeq
  }
}

object CapTripwire {
  /** Register a tripwire on the session and return it. */
  def install(spark: SparkSession): CapTripwire = {
    val t = new CapTripwire
    spark.listenerManager.register(t)
    t
  }
}
