package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object operators {
  /** A named query: builds a DataFrame from (session, testdata dir). */
  type Q = (SparkSession, String) => DataFrame

  /** (name, spark query, optional DuckDB oracle SQL).
    * Names carry a numeric prefix so driver output lists group logically. */
  final case class QueryDef(name: String, q: Q, oracle: Option[String])

  /** Force every named CTE of a DuckDB oracle MATERIALIZED (DuckDB
    * default-inlines CTEs, which re-opens the backing parquet per
    * reference — a deep chain then dies on "Too many open files" and
    * re-derives shared relations per consumer). ONE definition for
    * every oracle author (round-11 advice — two private copies were
    * drifting). SAFETY CAVEAT: the rewrite is textual — it matches
    * any `<word> AS (` substring, so an oracle must never carry that
    * pattern inside a string literal (none does; a future one would
    * corrupt the SQL silently — grep before quoting parentheses). */
  private[graft] def mat(sql: String): String =
    sql.replaceAll("(\\w+) AS \\(", "$1 AS MATERIALIZED (")
}
