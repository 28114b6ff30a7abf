package graft.sql

import scala.util.Try

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.iceberg.{IcebergIO, IcebergScan, IcebergWriter, ManifestReader, IcebergTransforms => T}

/** Storage-partitioned joins (VERDICT r12 #2): a catalog scan that
  * REPORTS its Iceberg partitioning as `KeyGroupedPartitioning`, so a
  * join of two graft tables bucketed (or identity-partitioned) on the
  * join key runs with ZERO Exchange — Spark's planner zips equal
  * partition tuples instead of shuffling both sides. On a 100-TB
  * fact⋈fact join of co-bucketed tables that is the whole shuffle.
  *
  * The three pieces Spark needs (all landed round 12 + here):
  *  1. the table declares its transforms (`GraftTable.partitioning()`),
  *  2. the catalog binds them as functions (`GraftV2Functions`, so both
  *     sides' `TransformExpression`s canonicalize equal),
  *  3. this scan groups files by partition tuple and reports one keyed
  *     `InputPartition` per tuple (`HasPartitionKey`).
  *
  * Opt-in and honest: the keyed path runs only under Spark's own SPJ
  * flag (`spark.sql.sources.v2.bucketing.enabled`) AND when the scan
  * can faithfully deliver rows grouped by tuple — no delete files (MoR
  * would re-route rows), parquet-only, no name mapping, no v3
  * initial-defaults, and every live entry carrying a complete,
  * convertible partition tuple. Anything else falls back to the native
  * spliced plan, exactly as before.
  *
  * File groups come straight from manifest entries — like
  * [[graft.iceberg.ManifestFileIndex]], planning touches no storage
  * beyond metadata already read. */
object GraftKeyedScan {

  /** Spark's storage-partitioned-join opt-in; the keyed scan rides it. */
  val ConfKey = "spark.sql.sources.v2.bucketing.enabled"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(ConfKey).exists(_.toBoolean)

  final case class Keyed(
      keyTypes: Seq[DataType],
      // (partition tuple, that tuple's (qualified path, size) files)
      groups: Seq[(InternalRow, Seq[(String, Long)])],
      // manifest-known totals (post-pruning) → SupportsReportStatistics,
      // so join sizing sees the relation's true size (P5), not the V2
      // default of "unknown = huge"
      totalRows: Long, totalBytes: Long)

  /** The keyed plan, or None when this table/snapshot cannot claim
    * KeyGroupedPartitioning faithfully. Metadata reads go through the
    * planning caches, so the splice-skip check and the scan build share
    * one decode. `preds` (pushed filters) prune entries exactly like the
    * native path — never semantics, only file count, since Spark keeps
    * the full residual filter. */
  def plan(spark: SparkSession, t: GraftTable,
           preds: Seq[graft.iceberg.IcebergPruning.ColPredicate] = Seq.empty)
      : Option[Keyed] = {
    if (t.partitionFields.isEmpty) return None
    if (t.opts.rowLineage || t.opts.keepProvenance ||
        t.opts.filters.nonEmpty || t.opts.mode != "default") return None
    val snapshot =
      Try(IcebergScan.selectSnapshot(spark, t.path, t.opts)).toOption
        .getOrElse(return None)
    if (snapshot.properties.contains(IcebergWriter.NameMappingProp)) return None
    if (snapshot.schema.exists(_.initialDefault.isDefined)) return None
    val keyTypes: Seq[DataType] = t.partitionFields.map { case (pf, src) =>
      val srcType = t.tableSchema.fields.find(_.name.equalsIgnoreCase(src))
        .map(_.dataType).getOrElse(return None)
      Try(T.parse(pf.transform)).toOption match {
        case Some(T.Identity)     => srcType
        case Some(T.Bucket(_))    => IntegerType
        case Some(T.Day) | Some(T.Month) | Some(T.Year) | Some(T.Hour) =>
          IntegerType
        case Some(T.Truncate(_))  => srcType
        case _                    => return None
      }
    }
    val conf = spark.sessionState.newHadoopConf()
    val root = IcebergIO.tableRoot(t.path)
    val meta = Try(ManifestReader.loadTable(
      root, snapshot, conf, t.opts.allowMovedPaths)).toOption.getOrElse(return None)
    val live = meta.entries.flatMap { case (_, es) => es.filter(_.status != 2) }
    // any delete content (pos/eq/DV) → MoR anti join re-routes rows;
    // the keyed grouping claim would still hold, but the native path is
    // the one wired for correctness there — stay on it
    if (live.exists(_.content != 0)) return None
    if (live.isEmpty) return None
    if (live.exists(e =>
        !e.fileFormat.equalsIgnoreCase("PARQUET") || e.fileSizeInBytes <= 0L))
      return None
    // entry-level pruning from the pushed filters (partition tuples +
    // column bounds) — the same keep/skip the native path runs
    val data = graft.iceberg.IcebergPruning.prune(
      live, preds, snapshot.partitionSpec, snapshot.schema)
    def qualify(p: String): String = IcebergIO.qualified(p, conf)
    val keyedFiles: Seq[(Seq[Any], (String, Long))] = data.map { e =>
      val vs = t.partitionFields.zip(keyTypes).map { case ((pf, _), kt) =>
        e.partition.get(pf.name) match {
          case None => return None // older-spec entry: tuple incomplete
          case Some(v) => toCatalyst(v, kt).getOrElse(return None)
        }
      }
      val resolved =
        if (t.opts.allowMovedPaths) IcebergIO.fullPath(root, e.filePath)
        else e.filePath
      (vs, (qualify(resolved), e.fileSizeInBytes))
    }
    val groups = keyedFiles.groupBy(_._1).toSeq.map { case (vs, fs) =>
      (new GenericInternalRow(vs.toArray): InternalRow, fs.map(_._2))
    }
    Some(Keyed(keyTypes, groups,
      totalRows = data.map(_.recordCount).sum,
      totalBytes = data.map(_.fileSizeInBytes).sum))
  }

  /** V2 source Filters → pruning predicates. Untranslatable shapes
    * extract NOTHING (conservative keep) — Spark always re-evaluates the
    * full residual, so translation can only skip files, never rows.
    * Value domains pass through verbatim; IcebergPruning.normalize
    * already tolerates external types (java.sql.Date, LocalDate,
    * BigDecimal, String), and an unrecognized value normalizes to None
    * = keep. */
  def toPredicates(f: org.apache.spark.sql.sources.Filter)
      : Seq[graft.iceberg.IcebergPruning.ColPredicate] = {
    import org.apache.spark.sql.{sources => s}
    import graft.iceberg.{IcebergPruning => P}
    def one(c: String, op: P.Op, v: Any) = Seq(P.ColPredicate(c, op, v))
    f match {
      case s.EqualTo(c, v) => one(c, P.Eq, v)
      case s.EqualNullSafe(c, null) => one(c, P.IsNull, null)
      case s.EqualNullSafe(c, v) => one(c, P.Eq, v)
      case s.LessThan(c, v) => one(c, P.Lt, v)
      case s.LessThanOrEqual(c, v) => one(c, P.Le, v)
      case s.GreaterThan(c, v) => one(c, P.Gt, v)
      case s.GreaterThanOrEqual(c, v) => one(c, P.Ge, v)
      case s.In(c, vs) => one(c, P.In, vs.toSeq)
      case s.IsNull(c) => one(c, P.IsNull, null)
      case s.IsNotNull(c) => one(c, P.NotNull, null)
      case s.And(l, r) => toPredicates(l) ++ toPredicates(r)
      case _ => Seq.empty
    }
  }

  /** Manifest Avro-domain partition value → Catalyst value of the
    * transform's key type. None = unconvertible (caller goes native). */
  private def toCatalyst(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => Some(null)
    case (i: java.lang.Integer, IntegerType | DateType) => Some(i.intValue)
    case (i: java.lang.Integer, LongType) => Some(i.longValue)
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
      Some(l.longValue)
    case (s: String, StringType) => Some(UTF8String.fromString(s))
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue)
    case (d: java.lang.Double, DoubleType) => Some(d.doubleValue)
    case (f: java.lang.Float, FloatType) => Some(f.floatValue)
    case _ => None
  }
}

/** One `InputPartition` per partition tuple; `partitionKey` is what lets
  * Spark's SPJ machinery zip equal tuples across the join. */
private final class GraftKeyedFilePartition(
    idx: Int, fs: Array[PartitionedFile], key: InternalRow)
    extends FilePartition(idx, fs) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** The V2 `Scan`+`Batch` serving the keyed plan through Spark's own
  * parquet reader factory (vectorized, field-id-resolved via the session
  * conf — the same reader the native path's relation uses). */
private final class GraftKeyedV2Scan(
    spark: SparkSession, table: GraftTable, schema: StructType,
    keyed: GraftKeyedScan.Keyed,
    filters: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(keyed.totalBytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(keyed.totalRows)
    }

  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-keyed ${table.name()} (${keyed.groups.size} partition tuples)" +
      (if (filters.isEmpty) "" else s" PushedFilters: ${filters.mkString(", ")}")
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      table.partitioning()
        .map(t => t: org.apache.spark.sql.connector.expressions.Expression),
      keyed.groups.size)

  override def planInputPartitions(): Array[InputPartition] =
    keyed.groups.zipWithIndex.map { case ((key, files), i) =>
      val pfs = files.map { case (p, len) =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p),
          0L, len, Array.empty[String], 0L, len)
      }.toArray
      new GraftKeyedFilePartition(i, pfs, key): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = spark.sessionState.conf
    // the exact conf hand-off Spark's own ParquetScan.createReaderFactory
    // performs — the read-support class and requested schema ride the
    // broadcast Hadoop conf, not the factory's constructor
    val hadoopConf = spark.sessionState.newHadoopConf()
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, schema.json)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    val broadcasted = spark.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    ParquetPartitionReaderFactory(
      sqlConf, broadcasted,
      dataSchema = table.tableSchema,
      readDataSchema = schema,
      partitionSchema = new StructType(),
      // row-group/page pruning inside the parquet reader; rows still
      // pass through Spark's residual Filter above the scan
      filters = filters,
      aggregation = None,
      options = new ParquetOptions(
        Map.empty[String, String], sqlConf))
  }
}

private[sql] object GraftKeyedV2Scan {
  def apply(spark: SparkSession, table: GraftTable, schema: StructType,
            keyed: GraftKeyedScan.Keyed,
            filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
      : Scan =
    new GraftKeyedV2Scan(spark, table, schema, keyed, filters)
}

/** Zero-partition scan for the "pushed filters pruned EVERY file" case.
  * Falling back to the V1 bridge there would rebuild the UNfiltered
  * native relation (the extension rule already skipped splicing), i.e. a
  * full-table scan to produce zero rows — at 100 TB, a point lookup for
  * absent data must plan zero splits instead. No partitioning claim:
  * `KeyGroupedPartitioning(…, 0)` has nothing to zip anyway. */
private[sql] final class GraftEmptyV2Scan(table: GraftTable, schema: StructType)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-keyed ${table.name()} (all files pruned)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition) =
        throw new IllegalStateException("empty scan has no partitions")
    }
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(0L)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(0L)
    }
}
