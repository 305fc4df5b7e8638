package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline
import graft.sources.Layout

/** q164 — the incremental delta export: append-only delta files per
  * touched shard; base files byte-untouched. */
class DeltaExportSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.deltaExport(spark, sfDir).collect()

  test("the read-back census equals the full-corpus raw derivation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expect = docs.groupBy { case (id, _, _, _) =>
      java.lang.Long.parseLong(md5hex(s"epoch0:$id").take(8), 16) >> 29
    }.map { case (sh, rows) =>
      sh -> (rows.length.toLong, rows.map(_._4).sum,
        rows.map { case (id, t, l, nc) =>
          java.lang.Long.parseLong(md5hex(s"$id|$nc|$l|${md5hex(t)}")
            .take(8), 16) }.sum)
    }
    val got = out.filter(_.getLong(0) < 99L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect,
      "base ⊎ delta must census to exactly the full corpus")
  }

  test("delivery-cost decisions: base untouched, one delta per touched shard") {
    def meta(k: Long): Row = out.find(_.getLong(0) == k).get
    assert(meta(99L).getLong(1) == 1L,
      "the delta write must not modify any base file")
    assert(meta(100L).getLong(1) == 1L,
      "each touched shard gains exactly one delta file, untouched " +
        "shards gain none")
  }

  test("the layout is append-only: shard dirs hold base + delta files") {
    val path = Layout.warehousePath(spark,
      Layout.tableName(sfDir, "deltashards"))
    val dirs = Layout.listWarehouseNames(spark, path, dirsOnly = true)
      .filter(_.startsWith("shard_id="))
    assert(dirs.nonEmpty)
    val counts = dirs.map(sd =>
      Layout.listWarehouseNames(spark, s"$path/$sd")
        .count(_.startsWith("part-")))
    assert(counts.forall(c => c >= 1 && c <= 2),
      s"each shard dir holds the base file and at most one delta: $counts")
    assert(counts.exists(_ == 2), "at least one shard received a delta")
  }
}
