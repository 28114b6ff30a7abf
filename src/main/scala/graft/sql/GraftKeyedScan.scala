package graft.sql

import scala.util.Try

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.iceberg.{IcebergIO, IcebergModel, IcebergPruning, IcebergScan, IcebergWriter, ManifestReader, IcebergTransforms => T}

/** Storage-partitioned joins + runtime (dim-side) pruning: a catalog scan
  * planned entirely from manifest entries.
  *
  * Two claim modes, chosen per QUERY SHAPE by [[GraftTableRewrite]] (the
  * rule tags the relation's options with [[GraftKeyedScan.ModeOption]]):
  *
  *  - `kgp` — the scan REPORTS its Iceberg partitioning as
  *    `KeyGroupedPartitioning`, so a join of two graft tables bucketed
  *    (or identity-partitioned) on the join key runs with ZERO Exchange,
  *    and an aggregation grouping by the partition keys skips its
  *    Exchange. Spark groups the emitted splits one TASK per partition
  *    tuple — the right trade only when the plan actually exploits the
  *    grouping, hence the shape gate. Under
  *    `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  *    .enabled` Spark keeps the per-tuple splits of the larger side as
  *    separate tasks, so a hot bucket is no longer one straggler.
  *
  *  - `splits` — NO partitioning claim: splits pack to
  *    `spark.sql.files.maxPartitionBytes` for full scan parallelism
  *    (a plain filtered read of a bucket(8) table must not collapse to
  *    8 tasks). Used for star-join shapes (equi-join on a partition
  *    source against a non-co-partitioned side) and partition-key point
  *    lookups, where the wins are entry pruning, zero-split empty scans,
  *    and RUNTIME filtering.
  *
  * Both modes implement `SupportsRuntimeV2Filtering`: a broadcast
  * dim-side IN-set re-prunes the retained manifest entries (partition
  * tuples AND column bounds, the same [[IcebergPruning]] keep/skip the
  * static path runs) before execution starts — Spark's dynamic partition
  * pruning for V2 sources. At 100 TB this turns `fact ⋈ dim WHERE
  * dim.attr = …` from a full fact scan into a scan of the surviving
  * tuples only. The filtered split set is always a SUBSET of the
  * original (entries only drop), satisfying Spark's runtime-filter
  * contract for key-grouped scans.
  *
  * MoR under EQUALITY deletes (VERDICT r13 #2): the keyed scan routes
  * live eq-delete files per partition tuple (a delete entry's tuple is
  * in its manifest, same as data) and filters deleted keys inside the
  * reader, so a CDC-upserted table — whose every epoch commits an
  * equality delete — KEEPS its zero-shuffle joins instead of losing
  * them until compaction. Splits bin by (tuple, sequence), giving each
  * split an exact "strictly newer, tuple-scoped or global" delete set.
  *
  * Opt-in and honest: the keyed path runs only under Spark's own SPJ
  * flag (`spark.sql.sources.v2.bucketing.enabled`) AND when the scan
  * can faithfully deliver rows grouped by tuple — no POSITION deletes
  * or DVs (their (file, pos) composition lives on the native path),
  * parquet-only, no name mapping, no v3 initial-defaults, one equality
  * key-column set, and every live entry carrying a complete,
  * convertible partition tuple. Anything else falls back to the native
  * spliced plan, exactly as before.
  *
  * File groups come straight from manifest entries — like
  * [[graft.iceberg.ManifestFileIndex]], planning touches no storage
  * beyond metadata already read. */
object GraftKeyedScan {

  /** Spark's storage-partitioned-join opt-in; the keyed scan rides it. */
  val ConfKey = "spark.sql.sources.v2.bucketing.enabled"

  /** Relation-option tag written by [[GraftTableRewrite]]: "kgp" claims
    * KeyGroupedPartitioning (plan exploits the grouping), "splits" packs
    * for parallelism without a claim. Absent (rewrite disabled, or a
    * plan shape the rule never settled) keeps the legacy claim. */
  val ModeOption = "graft.keyed-mode"
  val ModeKgp = "kgp"
  val ModeSplits = "splits"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(ConfKey).exists(_.toBoolean)

  /** One live data entry of the keyed plan: the manifest entry (kept for
    * runtime re-pruning — bounds, partition, null/NaN counts), the
    * resolved QUALIFIED path, the Catalyst-domain partition key, and the
    * entry's DATA sequence number (equality deletes reach strictly-older
    * sequences only). */
  final case class KeyedEntry(
      entry: IcebergModel.ManifestEntry, path: String, key: Seq[Any],
      seq: Long)

  /** One live EQUALITY-delete file routed into the keyed scan (VERDICT
    * r13 #2: SPJ under MoR deletes — a CDC-upserted table must keep its
    * zero-shuffle joins). `tuple` None = the delete is GLOBAL
    * (unpartitioned delete file: applies to every partition tuple, the
    * shape [[graft.iceberg.IcebergWriter.deleteEquality]] and the
    * streaming upsert sink write); Some(key) = scoped to that tuple per
    * the Iceberg partition-scoping rule. */
  final case class EqDelete(
      path: String, size: Long, seq: Long, tuple: Option[Seq[Any]])

  final case class Keyed(
      keyTypes: Seq[DataType],
      entries: Seq[KeyedEntry],
      // snapshot spec + schema so runtime filters can re-run the exact
      // entry-level keep/skip the static path ran
      spec: Seq[IcebergModel.PartitionFieldSpec],
      schemaCols: Seq[IcebergModel.Column],
      // manifest-known totals (post-pruning) → SupportsReportStatistics,
      // so join sizing sees the relation's true size (P5), not the V2
      // default of "unknown = huge". With eq-deletes these are an upper
      // bound (deleted rows still counted) — still far better than the
      // V2 "unknown = huge" default.
      totalRows: Long, totalBytes: Long,
      // live equality deletes (content=2) + the key columns they match
      // on, WITH parquet field ids so renamed key columns still resolve
      eqDeletes: Seq[EqDelete] = Seq.empty,
      eqKeySchema: StructType = new StructType()) {
    def groups: Seq[(Seq[Any], Seq[KeyedEntry])] =
      entries.groupBy(_.key).toSeq
  }

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
    // (entry, effective sequence) — eq-delete scoping is by sequence
    val live = meta.entries.flatMap { case (m, es) =>
      es.filter(_.status != 2).map(e => (e, e.seqOr(m.sequenceNumber)))
    }
    // POSITION deletes / DVs re-route rows by (file, pos) — that MoR
    // composition lives on the native path; stay on it. EQUALITY deletes
    // (the shape every CDC upsert epoch commits) route per partition
    // tuple below, so upserted tables keep their zero-shuffle joins.
    if (live.exists { case (e, _) => e.content == 1 || e.isDV }) return None
    val (dataLive0, eqLive) = live.partition(_._1.content == 0)
    if (dataLive0.isEmpty) return None
    if ((dataLive0 ++ eqLive).exists { case (e, _) =>
        !e.fileFormat.equalsIgnoreCase("PARQUET") || e.fileSizeInBytes <= 0L })
      return None
    def qualify(p: String): String = IcebergIO.qualified(p, conf)
    def resolvedPath(e: IcebergModel.ManifestEntry): String = qualify(
      if (t.opts.allowMovedPaths) IcebergIO.fullPath(root, e.filePath)
      else e.filePath)
    // tuple of an entry in the CATALYST domain; None = incomplete
    def tupleOf(e: IcebergModel.ManifestEntry): Option[Seq[Any]] = {
      val vs = t.partitionFields.zip(keyTypes).map { case ((pf, _), kt) =>
        e.partition.get(pf.name) match {
          case None => return None
          case Some(v) => toCatalyst(v, kt).getOrElse(return None)
        }
      }
      Some(vs)
    }
    // equality deletes: one shared key-column set (heterogeneous sets
    // would need the native path's per-pool composition), resolved by
    // field id against the snapshot schema so renames stay safe
    val (eqDeletes, eqKeySchema) =
      if (eqLive.isEmpty) (Seq.empty[EqDelete], new StructType())
      else {
        val idSets = eqLive.map(_._1.equalityIds).distinct
        if (idSets.size != 1 || idSets.head.isEmpty) return None
        val byId = snapshot.schema.map(c => c.id -> c).toMap
        val keyCols = idSets.head.map(id => byId.getOrElse(id, return None))
        // top-level primitives only (UnsafeProjection key equality), and
        // NO float/double keys: byte equality diverges from SQL equality
        // there (-0.0 vs 0.0, NaN bit patterns) while the native path
        // joins under NormalizeFloatingNumbers — and the Iceberg spec
        // itself forbids float/double identifier fields, so bailing to
        // the native plan loses nothing legitimate
        val keyStruct = Try(graft.iceberg.IcebergSchemaParser
          .toStructType(keyCols)).toOption.getOrElse(return None)
        if (keyStruct.fields.exists(f => f.dataType match {
            case _: StructType | _: ArrayType | _: MapType => true
            case FloatType | DoubleType => true
            case _ => false })) return None
        val ds = eqLive.map { case (e, seq) =>
          // empty tuple map = unpartitioned delete file = GLOBAL (the
          // writer's deleteEquality / streaming-upsert shape); a full
          // convertible tuple scopes to its partition; anything partial
          // is ambiguous → native path
          val tuple =
            if (e.partition.isEmpty) None
            else Some(tupleOf(e).getOrElse(return None))
          EqDelete(resolvedPath(e), e.fileSizeInBytes, seq, tuple)
        }
        (ds, keyStruct)
      }
    // entry-level pruning from the pushed filters (partition tuples +
    // column bounds) — the same keep/skip the native path runs. With
    // eq-deletes present, bounds-based pruning stays sound: a pruned
    // file can't contain a matching row, deleted or not.
    val bySig = dataLive0.map { case (e, s) => e.filePath -> s }.toMap
    // a data path added twice (abnormal but representable) would fold to
    // ONE sequence here; under eq-deletes that could scope a delete to
    // the wrong copy — the native path reads duplicates verbatim, go there
    if (eqDeletes.nonEmpty && bySig.size != dataLive0.size) return None
    val data = graft.iceberg.IcebergPruning.prune(
      dataLive0.map(_._1), preds, snapshot.partitionSpec, snapshot.schema)
    val keyedEntries: Seq[KeyedEntry] = data.map { e =>
      val vs = tupleOf(e).getOrElse(return None) // older-spec entry: bail
      KeyedEntry(e, resolvedPath(e), vs, bySig(e.filePath))
    }
    Some(Keyed(keyTypes, keyedEntries,
      snapshot.partitionSpec, snapshot.schema,
      totalRows = data.map(_.recordCount).sum,
      totalBytes = data.map(_.fileSizeInBytes).sum,
      eqDeletes = eqDeletes, eqKeySchema = eqKeySchema))
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

  /** RUNTIME V2 `Predicate` → pruning predicates — the dynamic-partition-
    * pruning bridge. Spark's `translateRuntimeFilterV2` emits `IN(col,
    * lit…)` (and `=` for a single value); literal values arrive in the
    * CATALYST domain (UTF8String, epoch-day ints, micros longs), which
    * `IcebergPruning.normalize` already accepts. Anything unrecognized
    * extracts nothing = conservative keep — the join itself still
    * filters rows, runtime pruning only skips files. */
  def toColPredicates(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Seq[graft.iceberg.IcebergPruning.ColPredicate] = {
    import graft.iceberg.{IcebergPruning => P}
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
    def refName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some(n.fieldNames.head)
      case _ => None
    }
    def litVal(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Any] = e match {
      case l: V2Literal[_] => Some(l.value)
      case _ => None
    }
    // total by construction: this runs inside execution (BatchScanExec's
    // filteredPartitions) — a malformed/unexpected shape must degrade to
    // "extract nothing", never fail the query
    Try(p.name match {
      case "IN" =>
        val ch = p.children()
        (for {
          h <- ch.headOption
          c <- refName(h)
          vs <- Try(ch.tail.toSeq.map(e => litVal(e).get)).toOption
        } yield Seq(P.ColPredicate(c, P.In, vs))).getOrElse(Seq.empty)
      case "=" =>
        val ch = p.children()
        (for { c <- refName(ch(0)); v <- litVal(ch(1)) }
          yield Seq(P.ColPredicate(c, P.Eq, v))).getOrElse(Seq.empty)
      case "AND" =>
        p.children().toSeq.collect {
          case c: org.apache.spark.sql.connector.expressions.filter.Predicate =>
            toColPredicates(c)
        }.flatten
      case "IS_NOT_NULL" =>
        p.children().headOption.flatMap(refName)
          .map(c => Seq(P.ColPredicate(c, P.NotNull, null))).getOrElse(Seq.empty)
      case _ => Seq.empty
    }).getOrElse(Seq.empty)
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

/** One split of one partition tuple; `partitionKey` is what lets Spark's
  * SPJ machinery zip equal tuples across the join (Spark groups splits
  * sharing a key into one task — or keeps them separate under the
  * partially-clustered conf). */
private class GraftKeyedFilePartition(
    idx: Int, fs: Array[PartitionedFile], key: InternalRow)
    extends FilePartition(idx, fs) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** A keyed split whose rows must pass an equality-delete filter: all
  * files in the split share one data sequence (the split packer bins by
  * (tuple, seq)), and `deleteFiles` are exactly the eq-delete files with
  * a STRICTLY newer sequence scoped to this tuple (or global). */
private final class GraftKeyedMorFilePartition(
    idx: Int, fs: Array[PartitionedFile], key: InternalRow,
    val deleteFiles: Array[(String, Long)])
    extends GraftKeyedFilePartition(idx, fs, key)

/** Executor-side soft cache of equality-delete KEY SETS: every split of
  * a tuple re-applies the same delete files, and at 1000 executors the
  * same epoch-delete file would otherwise be re-read once per task. Keys
  * are UnsafeProjection outputs, so set membership is byte-level — and
  * null-safe, the Iceberg equality-delete rule (null matches null). */
private[sql] object EqDeleteKeyCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[java.util.HashSet[InternalRow]]]()

  def load(files: Array[(String, Long)],
           factory: PartitionReaderFactory,
           keySchema: StructType): java.util.HashSet[InternalRow] = {
    // (path, SIZE) identity, not path alone: a table dropped and
    // recreated at the same location can re-mint the same delete path
    // (graft snapshot ids restart), and a long-lived executor must not
    // serve the old table's keys against the new one
    val cacheKey =
      files.map { case (p, len) => s"$p@$len" }.sorted.mkString("\n") +
        "#" + keySchema.catalogString
    val hit = Option(cache.get(cacheKey)).flatMap(r => Option(r.get()))
    hit.getOrElse {
      // GC cleared some referents (or delete-file sets churned across
      // epochs/queries): purge dead entries now so the map's keys —
      // potentially long concatenated path lists — don't accumulate
      // without bound on a long-lived executor.
      val it = cache.entrySet().iterator()
      while (it.hasNext) { if (it.next().getValue.get() == null) it.remove() }
      val set = new java.util.HashSet[InternalRow]()
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(keySchema)
      val pfs = files.map { case (p, len) =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p),
          0L, len, Array.empty[String], 0L, len)
      }
      val reader = factory.createReader(FilePartition(0, pfs))
      try {
        while (reader.next()) { set.add(proj(reader.get()).copy()): Unit }
      } finally reader.close()
      cache.put(cacheKey, new java.lang.ref.SoftReference(set))
      set
    }
  }
}

/** Wraps the parquet reader factory with the per-split equality-delete
  * filter. Row-based on purpose: the filter is per row, and the delete
  * sets are epoch-sized (the CDC world this serves) — the join shuffle
  * this path removes dwarfs the vectorization loss; compaction returns a
  * table to the vectorized delete-free path. */
private final class GraftKeyedMorReaderFactory(
    inner: PartitionReaderFactory,
    deleteReaderFactory: PartitionReaderFactory,
    extendedSchema: StructType,
    keySchema: StructType,
    outSchema: StructType) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
    val m = p.asInstanceOf[GraftKeyedMorFilePartition]
    val deleted =
      if (m.deleteFiles.isEmpty) null
      else EqDeleteKeyCache.load(m.deleteFiles, deleteReaderFactory, keySchema)
    val dataReader = inner.createReader(p)
    def bound(f: StructField): Expression = {
      val i = extendedSchema.fieldIndex(f.name)
      BoundReference(i, extendedSchema(i).dataType, extendedSchema(i).nullable)
    }
    val keyProj = UnsafeProjection.create(keySchema.fields.map(bound))
    val outProj =
      if (outSchema.fieldNames.sameElements(extendedSchema.fieldNames)) null
      else UnsafeProjection.create(outSchema.fields.map(bound))
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (dataReader.next()) {
          val r = dataReader.get()
          if (deleted == null || !deleted.contains(keyProj(r))) {
            current = if (outProj == null) r else outProj(r)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = dataReader.close()
    }
  }
}

/** The V2 `Scan`+`Batch` serving the keyed plan through Spark's own
  * parquet reader factory (vectorized, field-id-resolved via the session
  * conf — the same reader the native path's relation uses). */
private final class GraftKeyedV2Scan(
    spark: SparkSession, table: GraftTable, schema: StructType,
    keyed: GraftKeyedScan.Keyed,
    filters: Array[org.apache.spark.sql.sources.Filter],
    claimKgp: Boolean)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  // entries surviving static pushdown, then narrowed by runtime filters
  // (Spark calls filter() before re-planning input partitions). Always a
  // subset of the original — partition values can only DROP, which is
  // the runtime-filter contract for key-grouped scans.
  @volatile private var effective: Seq[GraftKeyedScan.KeyedEntry] = keyed.entries

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(keyed.totalBytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(keyed.totalRows)
    }

  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-keyed ${table.name()} (${keyed.groups.size} partition tuples" +
      (if (claimKgp) ", key-grouped" else ", packed") +
      (if (keyed.eqDeletes.isEmpty) ")"
       else s", ${keyed.eqDeletes.size} eq-deletes)") +
      (if (filters.isEmpty) "" else s" PushedFilters: ${filters.mkString(", ")}")
  override def toBatch: Batch = this

  // ---- runtime (dim-side) pruning ----------------------------------------

  override def filterAttributes(): Array[NamedReference] =
    table.partitionFields.map { case (_, src) => Expressions.column(src) }.toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val preds = predicates.toSeq.flatMap(GraftKeyedScan.toColPredicates)
    if (preds.nonEmpty) {
      val kept = IcebergPruning.prune(
        effective.map(_.entry), preds, keyed.spec, keyed.schemaCols)
        .map(_.filePath).toSet
      effective = effective.filter(e => kept(e.entry.filePath))
    }
  }

  // -------------------------------------------------------------------------

  override def outputPartitioning(): Partitioning =
    if (claimKgp)
      new KeyGroupedPartitioning(
        table.partitioning()
          .map(t => t: org.apache.spark.sql.connector.expressions.Expression),
        effective.map(_.key).distinct.size)
    else new UnknownPartitioning(0)

  /** Splits pack to Spark's own file-split arithmetic
    * (`maxPartitionBytes` / `openCostInBytes` / `minPartitionNum`), per
    * partition tuple: a 6-TB bucket emits many splits, not one. In kgp
    * mode every split still carries its tuple (`HasPartitionKey`) so
    * Spark groups them one task per tuple for SPJ — or keeps them
    * separate tasks under the partially-clustered conf. */
  override def planInputPartitions(): Array[InputPartition] = {
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    // Spark's own split arithmetic: min(maxPartitionBytes,
    // max(openCost, totalBytes/minPartitionNum))
    val maxSplit = FilePartition.maxSplitBytes(spark,
      effective.map(_.entry.fileSizeInBytes + openCost).sum)
    val out = Array.newBuilder[InputPartition]
    var idx = 0
    def splitsOf(es: Seq[GraftKeyedScan.KeyedEntry]): Seq[PartitionedFile] =
      es.flatMap { e =>
        val len = e.entry.fileSizeInBytes
        (0L until len by maxSplit).map { start =>
          PartitionedFile(InternalRow.empty, SparkPath.fromPathString(e.path),
            start, math.min(maxSplit, len - start), Array.empty[String], 0L, len)
        }
      }
    if (keyed.eqDeletes.isEmpty) {
      effective.groupBy(_.key).toSeq.foreach { case (key, es) =>
        val row: InternalRow = new GenericInternalRow(key.toArray)
        // bin-pack this tuple's splits with Spark's own packer (largest
        // first), so split sizing matches what a native file scan plans
        FilePartition.getFilePartitions(
            spark, splitsOf(es).sortBy(-_.length), maxSplit).foreach { fp =>
          out += new GraftKeyedFilePartition(idx, fp.files, row)
          idx += 1
        }
      }
    } else {
      // MoR (equality deletes): bins pack per (tuple, data sequence) so
      // every file in a split shares ONE delete applicability set —
      // exactly the eq-deletes with a strictly newer sequence, scoped to
      // this tuple or global
      effective.groupBy(e => (e.key, e.seq)).toSeq.foreach {
        case ((key, seq), es) =>
          val row: InternalRow = new GenericInternalRow(key.toArray)
          val applicable = keyed.eqDeletes
            .filter(d => d.seq > seq && d.tuple.forall(_ == key))
            .map(d => (d.path, d.size)).toArray
          FilePartition.getFilePartitions(
              spark, splitsOf(es).sortBy(-_.length), maxSplit).foreach { fp =>
            out += new GraftKeyedMorFilePartition(idx, fp.files, row, applicable)
            idx += 1
          }
      }
    }
    out.result()
  }

  /** The exact conf hand-off Spark's own ParquetScan.createReaderFactory
    * performs — the read-support class and requested schema ride the
    * broadcast Hadoop conf, not the factory's constructor. */
  private def parquetFactory(
      readSchema: StructType, dataSchema: StructType,
      pushed: Array[org.apache.spark.sql.sources.Filter])
      : PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = spark.sessionState.conf
    val hadoopConf = spark.sessionState.newHadoopConf()
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readSchema.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readSchema.json)
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
      dataSchema = dataSchema,
      readDataSchema = readSchema,
      partitionSchema = new StructType(),
      // row-group/page pruning inside the parquet reader; rows still
      // pass through Spark's residual Filter above the scan
      filters = pushed,
      aggregation = None,
      options = new ParquetOptions(
        Map.empty[String, String], sqlConf))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (keyed.eqDeletes.isEmpty)
      parquetFactory(schema, table.tableSchema, filters)
    else {
      // MoR: the data reader must surface the equality-key columns even
      // when the query pruned them; the wrapper filters deleted keys and
      // projects back to the requested schema
      val extended = StructType(schema.fields ++
        keyed.eqKeySchema.fields.filterNot(f =>
          schema.fieldNames.exists(_.equalsIgnoreCase(f.name))))
      // the wrapper's key projection binds by the TABLE's field name —
      // use the table-cased field when the query requested it
      val keySchemaAligned = StructType(keyed.eqKeySchema.fields.map { f =>
        extended.fields.find(_.name.equalsIgnoreCase(f.name)).getOrElse(f)
      })
      new GraftKeyedMorReaderFactory(
        inner = parquetFactory(extended, table.tableSchema, filters),
        deleteReaderFactory = parquetFactory(
          keyed.eqKeySchema, keyed.eqKeySchema, Array.empty),
        extendedSchema = extended,
        keySchema = keySchemaAligned,
        outSchema = schema)
    }
}

private[sql] object GraftKeyedV2Scan {
  def apply(spark: SparkSession, table: GraftTable, schema: StructType,
            keyed: GraftKeyedScan.Keyed,
            filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
            claimKgp: Boolean = true): Scan =
    new GraftKeyedV2Scan(spark, table, schema, keyed, filters, claimKgp)
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
