package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Layout

/** Round-10 lead item: the ANN artifact family gains the O(batch)
  * APPEND every text artifact already had (q82/q104) — a vector batch
  * lands in all four written base-family tables (assignment, flat
  * codes, residual codes, neighbor graph) by map-only work against
  * the HELD snapshot quantizer, published through the atomic
  * versioned-swap protocol. The update==rebuild equality itself is
  * the driver gate (q108's oracle re-derives every artifact from
  * scratch in SQL); this spec pins the STRUCTURAL contract around it:
  * composition arithmetic, key disjointness, bucket-spec survival,
  * graph-row invariants, and idempotence of the once-gated publish. */
class AnnAppendSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("q108 census: five artifacts; updated tables = base ∪ batch, keys disjoint") {
    val census = Similarity.annIndexAppend(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.keySet == Set(
      "ivfassign", "ivfpq", "pqcodes", "nngraph_base", "nngraph_batch"))

    val upd = spark.table(Layout.tableName(dir, "ivfassignbaseupd"))
    val nBase = upd.filter(pmod(col("vec_id"), lit(5)) =!= 0).count()
    val nBatch = upd.filter(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(census("ivfassign") == nBase + nBatch)
    assert(nBatch > 0, "append carried no batch rows")
    // per-vector artifacts agree on the composed row count
    assert(census("ivfpq") == census("ivfassign"))
    assert(census("pqcodes") == census("ivfassign"))
    // vec_id is a key of the composed assignment (base/batch disjoint)
    assert(upd.select("vec_id").distinct().count() == census("ivfassign"))
  }

  test("appended graph rows: bounded degree, self-free, and batch rows see batch neighbors") {
    Similarity.annIndexAppend(spark, dir).collect()
    val g = spark.table(Layout.tableName(dir, "nngraphbaseupd"))
    val batchRows = g.filter(pmod(col("vec_id"), lit(5)) === 0)
    val deg = batchRows.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(deg <= Similarity.GraphG, s"batch degree $deg exceeds G=${Similarity.GraphG}")
    assert(g.filter(col("vec_id") === col("nbr")).count() == 0)
    // the batch's candidate pools include its own routing (batch↔batch
    // edges are admissible), and base rows are the HELD snapshot's —
    // no base vector may point at a batch vector (back-edges are a
    // next-snapshot rebuild, the documented DiskANN discipline)
    val baseToBatch = g.filter(pmod(col("vec_id"), lit(5)) =!= 0 &&
      pmod(col("nbr"), lit(5)) === 0).count()
    assert(baseToBatch == 0, s"$baseToBatch held base rows gained batch back-edges")
  }

  test("the appended assignment keeps its bucket spec through the published view") {
    Similarity.annIndexAppend(spark, dir).collect()
    val prefix = Layout.tableName(dir, "ivfassignbaseupd") + "__v"
    val versioned = prefix + spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong).max
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(versioned))
    assert(cat.bucketSpec.exists(b =>
      b.numBuckets == Layout.Buckets && b.bucketColumnNames == Seq("cent_id")))
  }

  test("q112 fold: back-edges exist, untouched rows verbatim, every row rebuild-exact by partition") {
    // the fold CLOSES the asymmetry the previous test pins on q108:
    // after annGraphBackfold, base vectors DO point at batch vectors
    Similarity.annGraphBackfold(spark, dir).collect()
    val folded = spark.table(Layout.tableName(dir, "nngraphfold"))
    val baseToBatch = folded.filter(pmod(col("vec_id"), lit(5)) =!= 0 &&
      pmod(col("nbr"), lit(5)) === 0).count()
    assert(baseToBatch > 0, "fold produced no base→batch back-edges")
    // degree bound + self-free across the whole folded graph
    val deg = folded.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(deg <= Similarity.GraphG)
    assert(folded.filter(col("vec_id") === col("nbr")).count() == 0)
    // untouched base rows are the HELD table's rows verbatim — the
    // O(batch-affected) claim's observable footprint: vectors sharing
    // no cell with the batch were never recomputed, just carried
    val held = spark.table(Layout.tableName(dir, "nngraphbase"))
    val touched = folded.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      .select("vec_id").except(held.select("vec_id"))
    assert(touched.count() == 0, "fold invented base vectors")
    val foldedBase = folded.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val changedU = foldedBase.select("vec_id", "nbr")
      .except(held.select("vec_id", "nbr")).select("vec_id").distinct()
    // every changed vertex must have gained at least one batch
    // neighbor (the only admissible source of change in a fold)
    val changedWithoutBatchNbr = changedU
      .join(foldedBase.filter(pmod(col("nbr"), lit(5)) === 0)
        .select("vec_id").distinct(), Seq("vec_id"), "left_anti").count()
    assert(changedWithoutBatchNbr == 0,
      s"$changedWithoutBatchNbr vertices changed without any batch back-edge")
  }

  test("the append publish is once-gated: a second call re-reads, never re-publishes") {
    val first = Similarity.annIndexAppend(spark, dir).collect().toSeq
    val prefix = Layout.tableName(dir, "ivfassignbaseupd") + "__v"
    def maxV = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong).max
    val v = maxV
    val second = Similarity.annIndexAppend(spark, dir).collect().toSeq
    assert(second == first)
    assert(maxV == v, "second annIndexAppend call published a new version")
  }
}
