package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are read as Parquet so scans go through Spark's vectorized
  * columnar reader and Catalyst pushes filters / prunes columns into the
  * `FileSourceScanExec` (check `PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`). At cluster scale these would be
  * partitioned/bucketed datasets; the loaders keep that concern in one
  * place so a `spark.read.table(...)` catalog swap is a one-line change.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts normalization, tolerant of the two parquet encodings the
    * driver's generator has shipped:
    *
    *  - TIMESTAMP(NANOS) (rounds ≤ 7), which Spark 4 does not map to a
    *    Catalyst type: with `spark.sql.legacy.parquet.nanosAsLong=true`
    *    (set in [[graft.Sessions.builder]]) the column arrives as a
    *    nanosecond long, converted here with exact integral division
    *    (`div`, not `/` — float division's 256 ns ULP at ~1.7e18 ns
    *    could flip the truncated microsecond), matching DuckDB's
    *    ns→us cast;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 8 testdata),
    *    which Spark reads as TIMESTAMP_NTZ: cast to the session-zone
    *    TimestampType (session TZ is pinned UTC) so every downstream
    *    consumer keeps seeing the same instants DuckDB reads.
    *
    * Dispatch is on the REALIZED schema, not the round number, so the
    * loader keeps working against either generation of the files. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
