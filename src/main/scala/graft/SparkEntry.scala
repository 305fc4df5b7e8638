package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the scale
  * extensions) is exposed as a named query; each query with
  * SQL-expressible semantics carries a DuckDB oracle that the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All query groups, in presentation order. */
  private def allDefs: Vector[QueryDef] = {
    val defs =
      ReferenceParity.defs ++ Relational.defs ++ Dedup.defs ++
        Similarity.defs ++ TextAnalysis.defs ++ Multimodal.defs ++
        Pipeline.defs ++
        graft.streaming.EventsStream.defs ++ graft.streaming.Sessionize.defs ++
        graft.streaming.StreamDoor.defs
    // toMap would silently shadow a duplicated name — the gate would
    // shrink by one query with no error anywhere. Fail loudly instead.
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceParity.delayAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.q).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
