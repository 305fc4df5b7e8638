package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object operators {
  /** A named query: builds a DataFrame from (session, testdata dir). */
  type Q = (SparkSession, String) => DataFrame

  /** (name, spark query, optional DuckDB oracle SQL).
    * Names carry a numeric prefix so driver output lists group logically. */
  final case class QueryDef(name: String, q: Q, oracle: Option[String])
}
