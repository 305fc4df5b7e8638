package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY: optional comma-separated name filter (dev only;
    // the driver always runs the full set).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Skew-cap tripwire: a query whose execution fired any graft.cap()
    // metric produced a CAPPED result the uncapped SQL oracle cannot
    // match — deleting its dump makes the gate record an explicit
    // error for that query instead of an opaque hash mismatch.
    val caps = CapTripwire.install(spark)
    caps.drain(spark) // discard anything from session warmup
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val hit = caps.drain(spark)
        if (hit.nonEmpty) {
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$outDir/$name"))
          System.err.println(s"[verify] $name SKIPPED: skew cap fired (capped result " +
            s"cannot match the uncapped oracle): ${hit.mkString("; ")}")
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query may still have fired caps on partial
        // executions — drain them HERE so they are not attributed to
        // the next query's dump
        caps.drain(spark).foreach(c =>
          System.err.println(s"[verify] $name fired during failure: $c"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
