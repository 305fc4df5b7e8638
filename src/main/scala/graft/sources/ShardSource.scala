package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  *    story at the delivery layer). The accepted filters stay in the
  *    post-scan set too — rows re-check them, a belt-and-braces
  *    standard for v2 sources.
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
    with SupportsPushDownRequiredColumns {

  private var required: StructType = ShardSource.Schema
  private var shardSet: Option[Set[Long]] = None
  private var accepted: Array[Filter] = Array.empty

  private def longsOf(vs: Array[Any]): Option[Set[Long]] = {
    val ls = vs.collect { case l: Long => l; case i: Int => i.toLong }
    if (ls.length == vs.length) Some(ls.toSet) else None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case EqualTo("shard_id", v: Long) =>
        shardSet = Some(shardSet.getOrElse(Set.empty[Long]) + v)
        accepted :+= EqualTo("shard_id", v)
      case In("shard_id", vs) => longsOf(vs.asInstanceOf[Array[Any]]) match {
        case Some(ls) =>
          shardSet = Some(shardSet.map(_ intersect ls).getOrElse(ls))
          accepted :+= In("shard_id", vs)
        case None => ()
      }
      case _ => ()
    }
    // everything stays post-scan (rows re-check — the v2 convention
    // for sources whose pushdown is pruning, not evaluation)
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ShardScan(path, shardSet, required)
}

private[sources] final class ShardScan(path: String,
    shardSet: Option[Set[Long]], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // resolved lazily at planning: the selected shard dirs' part files
  private lazy val selected: (Seq[(String, Long)], Int) = {
    val conf = new Configuration()
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
    new ShardReaderFactory(required.fieldNames,
      // carry the session's codec list to executors (Configuration is
      // not serializable; the one key we need is)
      org.apache.spark.sql.SparkSession.active.sparkContext
        .hadoopConfiguration.get("io.compression.codecs", ""))
}

private[sources] final case class ShardPartition(file: String, shard: Long)
    extends InputPartition

private[sources] final class ShardReaderFactory(fields: Array[String],
    codecs: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[ShardPartition]
    new ShardReader(sp.file, sp.shard, fields, codecs)
  }
}

private[sources] final class ShardReader(file: String, shard: Long,
    fields: Array[String], codecs: String)
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val reader: java.io.BufferedReader = {
    ShardSource.openedFiles.incrementAndGet()
    val conf = new Configuration()
    if (codecs.nonEmpty) conf.set("io.compression.codecs", codecs)
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
