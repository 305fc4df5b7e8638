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
    // the physical storage is ONE standing bucketed table; versions
    // are MVCC views (gen <= N) over it
    val store = Layout.tableName(dir, "ivfassignbaseupd") + "store"
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(store))
    assert(cat.bucketSpec.exists(b =>
      b.numBuckets == Layout.Buckets && b.bucketColumnNames == Seq("cent_id")))
    // both generations share the store: gen 1 = the held snapshot's
    // segment, gen 2 = the appended batch — the append never rewrote
    // the base segment's rows
    val gens = spark.table(store).select("gen").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(gens == Set(1, 2), s"store generations: $gens")
    // generation membership is exactly the base/batch split
    assert(spark.table(store)
      .filter(col("gen") === 1 && pmod(col("vec_id"), lit(5)) === 0).count() == 0)
    assert(spark.table(store)
      .filter(col("gen") === 2 && pmod(col("vec_id"), lit(5)) =!= 0).count() == 0)
    // the published view exposes the base schema (no gen column)
    val upd = spark.table(Layout.tableName(dir, "ivfassignbaseupd"))
    assert(!upd.columns.contains("gen"))
  }

  test("the append's write I/O is O(batch): base-segment files untouched, batch files added") {
    Similarity.annIndexAppend(spark, dir).collect()
    val store = Layout.tableName(dir, "ivfassignbaseupd") + "store"
    val loc = new java.io.File(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(store))
      .location)
    val files = loc.listFiles().filter(f => f.getName.startsWith("part-"))
    assert(files.nonEmpty)
    // the O(batch) witness: no physical file mixes generations — the
    // append landed the batch as NEW files and never rewrote a base
    // row into a fresh file (a union-rewrite publish interleaves both
    // generations through every written file)
    val mixed = spark.table(store)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(countDistinct(col("gen")).as("g"))
      .filter(col("g") > 1).count()
    assert(mixed == 0, s"$mixed store files mix base and batch generations")
    val batchRows = spark.table(store).filter(col("gen") === 2).count()
    val baseRows = spark.table(store).filter(col("gen") === 1).count()
    assert(batchRows > 0)
    assert(baseRows > batchRows, "test premise: base larger than batch")
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
