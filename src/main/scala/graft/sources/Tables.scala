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
  /** events.ts is written as parquet TIMESTAMP(NANOS), which Spark 4 does
    * not map to a Catalyst type. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (see
    * [[graft.Sessions.builder]]) so the column arrives as a nanosecond
    * long; we convert to TimestampType with exact integral division
    * (`div`, not `/` — float division's 256 ns ULP at ~1.7e18 ns could
    * flip the truncated microsecond), matching DuckDB's ns->us cast. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
