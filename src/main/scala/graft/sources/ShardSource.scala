package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The LOADER side of the shard-export layout (q159/q163/q164) as a
  * first-class Spark connector — the DataSourceV2 route of the
  * engine-extension matrix (`TableProvider` → `Table` → `ScanBuilder`
  * → `Batch` → `PartitionReader`), with BOTH pushdowns a real
  * connector owes the optimizer:
  *
  *  - SHARD PRUNING (`SupportsPushDownFilters`): `shard_id = k` /
  *    `shard_id IN (...)` predicates resolve at PLANNING time to the
  *    matching `shard_id=k` directories — unselected shards' files
  *    are never listed into partitions, let alone opened (the
  *    directory layout IS the index; the q83 SelectedBucketsCount
  *    story at the delivery layer). Accepted shard_id filters are
  *    CONSUMED exactly (every row of `shard_id=k` lives under that
  *    directory, so directory selection IS the predicate) and are NOT
  *    re-evaluated post-scan — which is also what keeps aggregate
  *    pushdown alive (Spark skips it whenever post-scan filters
  *    remain). Conjunctions intersect: each consumed filter narrows
  *    the shard set, so `shard_id IN (2,3) AND shard_id = 1` selects
  *    nothing regardless of push order.
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only requested fields from each JSON line;
  *    `shard_id` costs nothing (it is the partition identity).
  *
  * One input partition per part FILE (a shard may hold base + delta
  * files, q164), so parallelism tracks the file count. Decompression
  * resolves through `io.compression.codecs` — the same explicit list
  * the session carries — so `.zst` parts stream through
  * [[ZstdCodec]] without native Hadoop libs.
  *
  * Registered by class name: `spark.read.format("graft.sources.
  * ShardSource").option("path", dir)`. Read-only by design (writes go
  * through the exporter, which owns layout + ordering invariants). */
final class ShardSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.ShardSource requires option(\"path\", <export dir>)")
    new ShardTable(path)
  }
}

object ShardSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("u", LongType),
    StructField("shard_id", LongType)))

  /** Part files OPENED by readers in this JVM — the observable the
    * q166 pruning decision gates (a plan-string check would couple the
    * gate to BatchScanExec's formatting; the counter is exact). */
  val openedFiles = new java.util.concurrent.atomic.AtomicLong()

  /** Manifest (statistics sidecar) reads in this JVM — q167's
    * stats-only aggregate reads bump THIS, never [[openedFiles]]. */
  val manifestReads = new java.util.concurrent.atomic.AtomicLong()

  /** The statistics sidecar an exporter writes next to the shard dirs
    * (one JSON line per shard: rows, payload mass, id range) — the
    * parquet-footer idea at the delivery layer. */
  val ManifestName = "_shard_manifest.json"

  /** The SESSION's Hadoop configuration for driver-side planning
    * (listings, manifest reads) — a bare `new Configuration()` drops
    * filesystem-specific session settings (object-store credentials,
    * fs.defaultFS overrides) on non-local filesystems (round-16
    * advice). */
  private[sources] def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** The session conf flattened to serializable pairs — readers run
    * executor-side and `Configuration` is not serializable, so the
    * factory carries the pairs and rebuilds (the role Spark's file
    * sources give a broadcast SerializableConfiguration). */
  private[sources] def confPairs(): Array[(String, String)] =
    hadoopConf().iterator().asScala.map(e => e.getKey -> e.getValue).toArray

  private[sources] def confOf(pairs: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    pairs.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

private[sources] final class ShardTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_shards($path)"
  override def schema(): StructType = ShardSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardScanBuilder(path)
}

private[sources] final class ShardScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var required: StructType = ShardSource.Schema
  private var shardSet: Option[Set[Long]] = None
  private var accepted: Array[Filter] = Array.empty
  // manifest-answerable aggregation: (group-by-shard?, agg kinds)
  private var aggSpec: Option[(Boolean, Seq[String])] = None

  private def longsOf(vs: Array[Any]): Option[Set[Long]] = {
    val ls = vs.collect { case l: Long => l; case i: Int => i.toLong }
    if (ls.length == vs.length) Some(ls.toSet) else None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // shard_id equality/IN is EXACT under the directory layout (every
    // row of shard_id=k lives under that dir), so those filters are
    // consumed completely — which also keeps aggregate pushdown alive
    // (Spark skips it whenever post-scan filters remain). The pushed
    // array is a CONJUNCTION, so every consumed filter INTERSECTS the
    // shard set: two ANDed equalities on different shards (or an IN
    // followed by a disjoint EqualTo) must select nothing, never the
    // union (round-16 advice, medium).
    def narrow(ls: Set[Long]): Unit =
      shardSet = Some(shardSet.map(_ intersect ls).getOrElse(ls))
    val rest = filters.filter {
      case EqualTo("shard_id", v: Long) =>
        narrow(Set(v))
        accepted :+= EqualTo("shard_id", v); false
      case In("shard_id", vs) => longsOf(vs.asInstanceOf[Array[Any]]) match {
        case Some(ls) =>
          narrow(ls)
          accepted :+= In("shard_id", vs); false
        case None => true
      }
      case _ => true
    }
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def fieldOf(e: Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames.length == 1 =>
      Some(n.fieldNames()(0))
    case _ => None
  }

  /** Accept an aggregation the statistics sidecar can answer —
    * COUNT(*), SUM(n_chars), MIN/MAX(doc_id), grouped by shard_id or
    * global — iff the manifest exists. Partial pushdown (Spark still
    * merges the per-shard rows), so a stale manifest cannot silently
    * widen: the q167 gate cross-checks against a full scan. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val conf = ShardSource.hadoopConf()
    val mp = new Path(path, ShardSource.ManifestName)
    if (!mp.getFileSystem(conf).exists(mp)) return false
    val groupOk: Option[Boolean] =
      aggregation.groupByExpressions() match {
        case Array() => Some(false)
        case Array(e) if fieldOf(e).contains("shard_id") => Some(true)
        case _ => None
      }
    val kinds = aggregation.aggregateExpressions().map {
      case _: CountStar => Some("count")
      // every exporter-written field is non-null, so COUNT(field)
      // equals the manifest row count
      case c: Count if !c.isDistinct && fieldOf(c.column()).isDefined =>
        Some("count")
      case s: Sum if !s.isDistinct && fieldOf(s.column()).contains("n_chars") =>
        Some("sum_chars")
      case m: Min if fieldOf(m.column()).contains("doc_id") => Some("min_doc")
      case m: Max if fieldOf(m.column()).contains("doc_id") => Some("max_doc")
      case _ => None
    }
    (groupOk, kinds.forall(_.isDefined)) match {
      case (Some(g), true) if kinds.nonEmpty =>
        aggSpec = Some((g, kinds.flatten.toSeq))
        true
      case _ => false
    }
  }

  override def build(): Scan = aggSpec match {
    case Some((byShard, kinds)) =>
      new ShardStatsScan(path, shardSet, byShard, kinds)
    case None =>
      new ShardScan(path, shardSet, required)
  }
}

/** The statistics-only scan: answers a pushed aggregation from the
  * manifest sidecar — ZERO data files opened (the q167 observable).
  * One input partition; the reader streams the manifest's per-shard
  * lines (filtered by any consumed shard predicate) as PARTIAL rows
  * Spark's final aggregate merges. */
private[sources] final class ShardStatsScan(path: String,
    shardSet: Option[Set[Long]], byShard: Boolean, kinds: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType = {
    val aggs = kinds.map {
      case "count"     => StructField("count", LongType)
      case "sum_chars" => StructField("sum_chars", LongType)
      case "min_doc"   => StructField("min_doc", LongType)
      case "max_doc"   => StructField("max_doc", LongType)
    }
    StructType(
      (if (byShard) Seq(StructField("shard_id", LongType)) else Nil) ++ aggs)
  }

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftShardStatsScan kinds=${kinds.mkString(",")} byShard=$byShard"

  override def planInputPartitions(): Array[InputPartition] =
    Array(ManifestPartition(
      new Path(path, ShardSource.ManifestName).toString,
      shardSet.map(_.toSeq.sorted)))

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(byShard, kinds, ShardSource.confPairs())
}

private[sources] final case class ManifestPartition(file: String,
    shards: Option[Seq[Long]]) extends InputPartition

private[sources] final class ManifestReaderFactory(byShard: Boolean,
    kinds: Seq[String], conf: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[ManifestPartition]
    new ManifestReader(mp.file, mp.shards.map(_.toSet), byShard, kinds, conf)
  }
}

private[sources] final class ManifestReader(file: String,
    shards: Option[Set[Long]], byShard: Boolean, kinds: Seq[String],
    conf: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val reader: java.io.BufferedReader = {
    ShardSource.manifestReads.incrementAndGet()
    val p = new Path(file)
    val fs = p.getFileSystem(ShardSource.confOf(conf))
    new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
  }

  private var node: com.fasterxml.jackson.databind.JsonNode = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val n = mapper.readTree(line)
      // header lines (schema, format version) carry no shard_id
      val sid = n.get("shard_id")
      if (sid != null && shards.forall(_.contains(sid.asLong()))) {
        node = n; return true
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = {
    val aggVals: Seq[Any] = kinds.map {
      case "count"     => node.get("rows").asLong()
      case "sum_chars" => node.get("sum_chars").asLong()
      case "min_doc"   => node.get("min_doc").asLong()
      case "max_doc"   => node.get("max_doc").asLong()
    }
    InternalRow.fromSeq(
      (if (byShard) Seq(node.get("shard_id").asLong()) else Nil) ++ aggVals)
  }

  override def close(): Unit = reader.close()
}

private[sources] final class ShardScan(path: String,
    shardSet: Option[Set[Long]], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // resolved lazily at planning: the selected shard dirs' part files
  private lazy val selected: (Seq[(String, Long)], Int) = {
    val conf = ShardSource.hadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val dirs = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("shard_id="))
    val total = dirs.size
    val kept = dirs.filter { d =>
      val sh = d.getName.stripPrefix("shard_id=").toLong
      shardSet.forall(_.contains(sh))
    }
    val files = kept.flatMap { d =>
      val sh = d.getName.stripPrefix("shard_id=").toLong
      fs.listStatus(d).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("part-"))
        .map(p => p.toString -> sh)
    }
    (files, total)
  }

  override def description(): String = {
    val (files, total) = selected
    val shown = shardSet.map(_.size.toString).getOrElse("all")
    s"GraftShardScan shards=$shown/$total files=${files.length}"
  }

  override def planInputPartitions(): Array[InputPartition] =
    selected._1.map { case (f, sh) => ShardPartition(f, sh) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // carry the FULL session conf to executors as pairs (codec list,
    // object-store credentials, fs.defaultFS — Configuration is not
    // serializable, the pairs are)
    new ShardReaderFactory(required.fieldNames, ShardSource.confPairs())
}

private[sources] final case class ShardPartition(file: String, shard: Long)
    extends InputPartition

private[sources] final class ShardReaderFactory(fields: Array[String],
    conf: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[ShardPartition]
    new ShardReader(sp.file, sp.shard, fields, conf)
  }
}

private[sources] final class ShardReader(file: String, shard: Long,
    fields: Array[String], confPairs: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val reader: java.io.BufferedReader = {
    ShardSource.openedFiles.incrementAndGet()
    val conf = ShardSource.confOf(confPairs)
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val raw: java.io.InputStream = fs.open(p)
    val codec = new CompressionCodecFactory(conf).getCodec(p)
    val in = if (codec == null) raw else codec.createInputStream(raw)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  }

  private var line: String = _

  override def next(): Boolean = { line = reader.readLine(); line != null }

  override def get(): InternalRow = {
    val node = mapper.readTree(line)
    val vals: Array[Any] = fields.map {
      case "doc_id"   => node.get("doc_id").asLong()
      case "text"     => UTF8String.fromString(node.get("text").asText())
      case "lang"     => UTF8String.fromString(node.get("lang").asText())
      case "n_chars"  => node.get("n_chars").asLong()
      case "u"        => node.get("u").asLong()
      case "shard_id" => shard
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
