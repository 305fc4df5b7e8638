package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline
import graft.sources.Layout

/** q165 — export compaction: crossed shards fold back to one file via
  * temp + atomic directory swap; content is invariant. */
class ExportCompactionSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.exportCompaction(spark, sfDir).collect()

  test("compaction is content-invariant: census equals the full corpus") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expect = docs.groupBy { case (id, _, _, _) =>
      java.lang.Long.parseLong(md5hex(s"cexp0:$id").take(8), 16) >> 29
    }.map { case (sh, rows) =>
      sh -> (rows.length.toLong, rows.map(_._4).sum,
        rows.map { case (id, t, l, nc) =>
          java.lang.Long.parseLong(md5hex(s"$id|$nc|$l|${md5hex(t)}")
            .take(8), 16) }.sum)
    }
    val got = out.filter(_.getLong(0) < 99L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
  }

  test("fold decisions: crossed to one file, uncrossed untouched, policy exact") {
    def meta(k: Long): Row = out.find(_.getLong(0) == k).get
    assert(meta(99L).getLong(1) == 1L, "every crossed shard folds to one file")
    assert(meta(100L).getLong(1) == 1L, "uncrossed shard files byte-untouched")
    assert(meta(101L).getLong(1) == 1L, "crossed set == the policy prediction")
  }

  test("the swap left no temp residue and every file is a zstd part") {
    val path = Layout.warehousePath(spark,
      Layout.tableName(sfDir, "cexpshards"))
    val names = Layout.listWarehouseNames(spark, path)
    assert(!names.exists(_.contains("__fold")), "temp fold dir must be gone")
    val dirs = names.filter(_.startsWith("shard_id="))
    dirs.foreach { sd =>
      val parts = Layout.listWarehouseNames(spark, s"$path/$sd")
        .filter(_.startsWith("part-"))
      assert(parts.nonEmpty && parts.forall(_.endsWith(".zst")), s"$sd: $parts")
    }
  }
}
