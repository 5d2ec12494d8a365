package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.io.Source
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.TileGrid

/** DataSourceV2 reader for a per-tile point-file directory — the Spark
  * incarnation of the reference's elevation-file tree, where each tile's
  * point cloud lives in its own file and "selecting tiles" means
  * selecting FILES (tile_processor/tileconfig.py:446-489, 633-639;
  * FIXTURES.md §2).
  *
  * This is the 100 TB-relevant shape: a filter on `tile_id` must never
  * open non-matching files. The source implements
  * `SupportsPushDownFilters` and prunes the file list at PLANNING time
  * (one `InputPartition` per surviving file), plus
  * `SupportsPushDownRequiredColumns` so a narrow projection parses only
  * the needed fields. At cluster scale the same structure prunes S3
  * listings instead of local files.
  *
  * File format: one `<root>/pts_<tile_id>.xyz` per tile, whitespace rows
  * `gid x y z` — a deterministic stand-in for LAZ (the real decoder would
  * slot into [[TileDirPartitionReader.parse]]).
  */
class TileDirSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TileDirSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TileDirTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object TileDirSource {
  val schema: StructType = StructType(Seq(
    StructField("tile_id", StringType, nullable = false),
    StructField("gid", LongType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("z", IntegerType, nullable = false)))

  val FileRe = "pts_(t[0-9]+_[0-9]+)\\.xyz$".r

  /** Deterministic fixture: 6 points per tile, integer-only, derived from
    * TileGrid constants alone (identical at every scale factor). */
  def writeFixture(root: String): Unit = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    TileGrid.tiles.foreach { t =>
      val body = (0 until 6).map { i =>
        val gid = (t.tx * TileGrid.N + t.ty) * 100L + i
        s"$gid ${t.xmin + i * 400} ${t.ymin + i * 400} ${(t.tx + t.ty) * 10 + i}"
      }.mkString("", "\n", "\n")
      Files.write(dir.resolve(s"pts_${t.tile_id}.xyz"),
        body.getBytes(StandardCharsets.UTF_8))
    }
  }
}

class TileDirTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tiledir($path)"
  override def schema(): StructType = TileDirSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TileDirScanBuilder(path)
}

/** Holds the pushdown state: tile_id equality/IN filters become a file
  * allowlist (`None` = no constraint); pruned columns become the reader's
  * projection. tile_id filters are consumed EXACTLY (file `pts_t.xyz`
  * contains only tile t's rows), so they are not re-evaluated post-scan;
  * any other filter stays in the Spark plan. */
class TileDirScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var keepTiles: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TileDirSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("tile_id", _: String) => true
      case In("tile_id", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    val sets = supported.map {
      case EqualTo(_, v: String) => Set(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
      case f => throw new IllegalStateException(s"unexpected pushed filter $f")
    }
    if (sets.nonEmpty)
      keepTiles = Some(sets.reduce(_ intersect _))
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    required = StructType(TileDirSource.schema.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new TileDirScan(path, keepTiles, pushed, required)
}

class TileDirScan(path: String, keepTiles: Option[Set[String]],
    pushed: Array[Filter], required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"TileDirScan path=$path, PushedTileFilters=${pushed.mkString("[", ", ", "]")}, " +
      s"files=${plannedFiles.length}/${TileGrid.tiles.length}"

  override def toBatch: Batch = this

  /** Planning-time pruning: list once on the driver, keep only files whose
    * name matches an allowed tile. One partition per file — at real scale
    * each LAZ is ~2 GB, the natural task granularity of the reference's
    * one-file-per-worker model (worker.py:217-224). */
  private lazy val plannedFiles: Array[(String, String)] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
    files.iterator.flatMap { f =>
      TileDirSource.FileRe.findFirstMatchIn(f.getName).map(m => (f.getPath, m.group(1)))
    }.filter { case (_, tid) => keepTiles.forall(_.contains(tid)) }
      .toArray.sortBy(_._1)
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedFiles.map { case (p, tid) => TileDirInputPartition(p, tid) }

  override def createReaderFactory(): PartitionReaderFactory =
    new TileDirReaderFactory(required)
}

case class TileDirInputPartition(filePath: String, tileId: String) extends InputPartition

class TileDirReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TileDirPartitionReader(partition.asInstanceOf[TileDirInputPartition], required)
}

class TileDirPartitionReader(part: TileDirInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val src = Source.fromFile(part.filePath)
  private val lines = src.getLines().filter(_.nonEmpty)
  private var current: InternalRow = _

  // resolve the projection once, not per row
  private val getters: Array[Array[String] => Any] = required.fields.map { f =>
    f.name match {
      case "tile_id" => _ => UTF8String.fromString(part.tileId)
      case "gid" => (t: Array[String]) => t(0).toLong
      case "x" => (t: Array[String]) => t(1).toInt
      case "y" => (t: Array[String]) => t(2).toInt
      case "z" => (t: Array[String]) => t(3).toInt
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }

  private def parse(line: String): InternalRow = {
    val tok = line.split("\\s+")
    val vals = new Array[Any](getters.length)
    var i = 0
    while (i < getters.length) { vals(i) = getters(i)(tok); i += 1 }
    new GenericInternalRow(vals)
  }

  override def next(): Boolean =
    if (lines.hasNext) { current = parse(lines.next()); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
