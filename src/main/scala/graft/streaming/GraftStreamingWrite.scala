package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.graftshim.GraftParquetWrite
import org.apache.spark.sql.types._

import graft.iceberg.IcebergWriter

/** The V2 `StreamingWrite` behind `df.writeStream.toTable("graft.db.t")`
  * (and `.format("graft")` streaming sinks) — streaming ingestion lands
  * through the CATALOG's write context instead of a raw path.
  *
  * Execution shape (designed for the 1000-executor case):
  *  - executors write parquet data files DIRECTLY (row-routed into one
  *    file per partition tuple per task, field-id-stamped footers — see
  *    [[GraftParquetFileWriter]]); nothing row-shaped ever returns to
  *    the driver;
  *  - commit messages carry only (file path, partition tuple) pairs;
  *  - the driver reads the new files' FOOTERS for manifest stats and
  *    commits one append snapshot per epoch — the same metadata path the
  *    batch writer takes ([[IcebergWriter.commitStreamBatch]]), run
  *    through `GraftTable.withWrite` so REST-backed tables publish via
  *    `commitThrough`.
  *
  * Exactly-once matches [[IcebergStreamSink]]: the epoch id is recorded
  * in the snapshot summary under a per-QUERY key (`queryId` is stable
  * across restarts from one checkpoint), and a replayed epoch whose id
  * is already committed deletes its re-written files and commits
  * nothing. Task retries are fenced by Spark's output commit
  * coordinator; files from non-committed attempts are never referenced
  * by a manifest and are reclaimable by `remove_orphan_files`.
  *
  * `complete` output mode maps to a full-table overwrite per epoch
  * (Spark signals it through `SupportsTruncate.truncate()`).
  *
  * CDC-apply (upsert) streaming: with `upsertKeys` (the `upsert-keys`
  * writer option, typically with `update` output mode), each epoch
  * commits an equality delete on its key values plus its data files in
  * ONE snapshot ([[IcebergWriter.commitStreamBatch]]'s merge shape) —
  * every epoch row replaces the current row of its key without
  * rewriting a single file, and the epoch-id fence makes replays
  * no-ops exactly as in append mode.
  *
  * Full change-feed apply: `changeCol` (the `upsert-change-column`
  * writer option) names a STRING column of the feed — NOT a table
  * column — whose value 'delete' (or 'D') marks a tombstone row: its
  * key joins the epoch's equality delete but no data row is written,
  * so true deletions replicate. Any other value (CDC 'insert',
  * changelog 'update_postimage', null, …) is an upsert row. This is
  * exactly the shape `iceberg_changelog` / the CDC stream source emit
  * (`_change_type`), so source→sink table replication is one
  * `withColumnRenamed` away. Tombstone keys ride keys-only scratch
  * parquet per task; the driver folds them into the delete file and
  * removes the scratch before the commit returns.
  *
  * INTRA-EPOCH ORDERING. Without an ordinal, an epoch's equality delete
  * reaches strictly-OLDER sequence numbers only, so a key colliding
  * between a tombstone and a data row resolves DELETE-BEFORE-INSERT —
  * the CDC update-pair convention (one source commit per epoch always
  * satisfies it; `max-snapshots-per-trigger=1` on the CDC source pins
  * that). A feed whose delete can FOLLOW the insert inside one epoch
  * (multi-commit batching, Debezium-style streams) must name
  * `ordinalCol` (the `upsert-ordinal-column` writer option): a LONG/INT
  * feed-metadata column monotone in feed order (a commit sequence, LSN,
  * Kafka offset — the CDC source's `_commit_snapshot_id` works for
  * graft-written sources). The write then REQUIRES a clustered-by-key,
  * sorted-by-(key, ordinal) distribution (Spark plans the shuffle —
  * the same repartition every keyed upsert sink performs), and each
  * task resolves every key run to its LAST action: final delete →
  * tombstone only; final upsert → exactly that row. Ties (a CDC update
  * pair shares its commit's ordinal) resolve delete-first, matching the
  * no-ordinal convention. NULL ordinals fail the task loudly.
  */
final class GraftStreamingWrite(
    // resolution + commit context (root for hadoop tables; commitThrough
    // for REST) — a function so graft.streaming needn't depend on
    // graft.sql's GraftTable directly
    withWrite: SparkSession => (String => Unit) => Unit,
    // metadata-resolving location (table root, or the REST read pin)
    tableLocation: String,
    info: LogicalWriteInfo,
    replaceAll: Boolean,
    upsertKeys: Seq[String] = Seq.empty,
    changeCol: Option[String] = None,
    ordinalCol: Option[String] = None) extends StreamingWrite {

  // fail at stream START, not first commit: unknown key columns are a
  // configuration error the user should see before any file is written
  upsertKeys.foreach { k =>
    require(info.schema().fieldNames.contains(k),
      s"streaming upsert: key column '$k' is not in the write schema " +
        s"(${info.schema().fieldNames.mkString(", ")})")
  }
  require(changeCol.isEmpty || upsertKeys.nonEmpty,
    "streaming upsert: upsert-change-column requires upsert-keys")
  changeCol.foreach { c =>
    val f = info.schema().fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"streaming upsert: change column '$c' is not in the write schema " +
          s"(${info.schema().fieldNames.mkString(", ")})"))
    require(f.dataType == StringType,
      s"streaming upsert: change column '$c' must be STRING, is ${f.dataType.sql}")
    require(!upsertKeys.contains(c),
      s"streaming upsert: change column '$c' cannot be an upsert key")
  }
  require(ordinalCol.isEmpty || changeCol.nonEmpty,
    "streaming upsert: upsert-ordinal-column requires upsert-change-column " +
      "(without tombstones an epoch has no ordering ambiguity)")
  ordinalCol.foreach { c =>
    val f = info.schema().fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"streaming upsert: ordinal column '$c' is not in the write schema " +
          s"(${info.schema().fieldNames.mkString(", ")})"))
    require(f.dataType == LongType || f.dataType == IntegerType,
      s"streaming upsert: ordinal column '$c' must be BIGINT or INT, " +
        s"is ${f.dataType.sql}")
    require(!upsertKeys.contains(c) && !changeCol.contains(c),
      s"streaming upsert: ordinal column '$c' cannot also be a key or " +
        "change column")
  }

  private def batchKey: String =
    IcebergStreamSink.batchIdKey("v2-" + info.queryId())

  override def createStreamingWriterFactory(
      physical: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val root = graft.iceberg.IcebergIO.tableRoot(tableLocation)
    // change + ordinal columns are feed metadata, not table data: the
    // table-side support (schema guard, ids, transforms) sees the schema
    // WITHOUT them
    val incoming = info.schema()
    val metaCols: Set[String] = (changeCol.toSeq ++ ordinalCol).toSet
    val dataSchema =
      if (metaCols.isEmpty) incoming
      else StructType(incoming.fields.filterNot(f => metaCols.contains(f.name)))
    val sup = IcebergWriter.streamingWriteSupport(spark, root, dataSchema)
    // Bind the table's partition-transform Columns (the SAME expressions
    // the batch writer and pruner use) to the incoming row layout: an
    // analyzed Project over an empty frame resolves them, then attribute
    // refs become ordinal BoundReferences the executors can evaluate
    // without an analyzer.
    val bound: Seq[Expression] =
      if (sup.transformCols.isEmpty) Seq.empty
      else {
        val plain = StructType(info.schema().fields.map(f =>
          StructField(f.name, f.dataType, f.nullable)))
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], plain)
        val analyzed = empty.select(sup.transformCols: _*).queryExecution.analyzed
        val proj = analyzed.collect { case p: Project => p }.head
        val childOut = proj.child.output
        proj.projectList.map { ne =>
          val e = ne match { case a: Alias => a.child; case o => o }
          e.transformUp {
            case ar: AttributeReference =>
              val i = childOut.indexWhere(_.exprId == ar.exprId)
              require(i >= 0, s"unbound transform attribute ${ar.name}")
              BoundReference(i, ar.dataType, ar.nullable)
          }
        }
      }
    // ordinal plumbing for the change-column feed: data rows are written
    // through a projection that strips the change column; tombstone rows
    // contribute only their key columns (keys-only scratch parquet)
    val dataProj: Seq[Expression] =
      if (changeCol.isEmpty) Seq.empty
      else dataSchema.fields.toSeq.map { f =>
        val i = incoming.fieldIndex(f.name)
        BoundReference(i, incoming(i).dataType, incoming(i).nullable)
      }
    // ONE ordered field list drives BOTH the tombstone parquet schema and
    // the key projection: RowFileWriter writes positionally, so deriving
    // them separately (schema in table order, projection in upsert-keys
    // order) would write key VALUES under swapped column NAMES whenever
    // the user lists multi-column keys in a different order than the
    // table schema — commitStreamBatch reads the scratch by name, so the
    // equality delete would then delete the WRONG rows, silently when the
    // key columns share a type.
    val tombFields: Seq[StructField] =
      if (changeCol.isEmpty) Seq.empty
      else sup.schemaWithIds.fields.toSeq.filter(f => upsertKeys.contains(f.name))
    val keyProj: Seq[Expression] =
      if (changeCol.isEmpty) Seq.empty
      else tombFields.map { f =>
        val i = incoming.fieldIndex(f.name)
        BoundReference(i, incoming(i).dataType, incoming(i).nullable)
      }
    val tombParquet =
      if (changeCol.isEmpty) None
      else Some(GraftParquetWrite.prepare(spark, StructType(tombFields)))
    GraftStreamingWriterFactory(
      sup.dataDir, sup.specFields, bound,
      GraftParquetWrite.prepare(spark, sup.schemaWithIds),
      // floor at 1: a 0/negative setting would make the LRU evict from
      // an empty map on the first row (NoSuchElementException per task)
      maxOpenWriters = spark.conf
        .getOption("spark.graft.streaming.maxOpenWriters")
        .map(_.toInt.max(1)).getOrElse(32),
      changeIdx = changeCol.map(incoming.fieldIndex).getOrElse(-1),
      dataProjExprs = dataProj,
      keyProjExprs = keyProj,
      tombstoneParquet = tombParquet,
      ordinalIdx = ordinalCol.map(incoming.fieldIndex).getOrElse(-1),
      ordinalIsLong = ordinalCol.exists(c =>
        incoming(incoming.fieldIndex(c)).dataType == LongType))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: GraftStreamFilesMessage => m }
    val files = msgs.flatMap(_.files)
    val tombstones = msgs.flatMap(_.tombstones)
    val spark = SparkSession.active
    withWrite(spark) { root =>
      IcebergWriter.commitStreamBatch(
        spark, root, files, batchKey, epochId, replaceAll = replaceAll,
        upsertKeys = upsertKeys, tombstoneFiles = tombstones)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val msgs = messages.toSeq.collect { case m: GraftStreamFilesMessage => m }
    (msgs.flatMap(_.files).map(_._1) ++ msgs.flatMap(_.tombstones)).foreach { p =>
      val hp = new Path(p)
      try hp.getFileSystem(conf).delete(hp, false)
      catch { case _: Exception => () }
    }
  }
}

/** (file path, partition tuple in manifest Avro domain) per written data
  * file, plus the task's keys-only tombstone scratch paths (CDC apply). */
final case class GraftStreamFilesMessage(
    files: Seq[(String, Map[String, Any])],
    tombstones: Seq[String] = Seq.empty) extends WriterCommitMessage

private[streaming] final case class GraftStreamingWriterFactory(
    dataDir: String,
    specFields: Seq[(String, String)], // (fieldName, avroType)
    boundTransforms: Seq[Expression],
    parquet: GraftParquetWrite.WriteSupport,
    maxOpenWriters: Int = 32,
    // CDC apply: incoming-row ordinal of the change column (-1 = none),
    // strip-the-change-column projection, key projection, and the
    // keys-only parquet support for tombstone scratch files
    changeIdx: Int = -1,
    dataProjExprs: Seq[Expression] = Seq.empty,
    keyProjExprs: Seq[Expression] = Seq.empty,
    tombstoneParquet: Option[GraftParquetWrite.WriteSupport] = None,
    // intra-epoch ordering: incoming-row index of the ordinal column
    // (-1 = none). When set, the write REQUIRED clustering by key and
    // (key, ordinal) in-partition order, so each key's rows arrive
    // consecutively and the writer keeps only the run's LAST action.
    ordinalIdx: Int = -1,
    ordinalIsLong: Boolean = true)
    extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftStreamingDataWriter(this, partitionId, taskId, epochId)
}

/** Routes each row to the open file of its partition tuple. One parquet
  * file per distinct tuple per task per epoch — matching the batch
  * writer's hive-layout granularity (a data file holds exactly one
  * tuple, the Iceberg invariant the manifests encode). */
private final class GraftStreamingDataWriter(
    f: GraftStreamingWriterFactory,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val projection =
    if (f.boundTransforms.isEmpty) null
    else UnsafeProjection.create(f.boundTransforms.toArray)

  // per spec field: projected-row ordinal → Avro-domain partition value
  private val extractors: Seq[InternalRow => Any] =
    f.specFields.zip(f.boundTransforms).zipWithIndex.map {
      case (((name, avro), e), i) =>
        val get: InternalRow => Any = (avro, e.dataType) match {
          case ("int", IntegerType | DateType) => r => Int.box(r.getInt(i))
          case ("int", LongType) => r => Int.box(r.getLong(i).toInt)
          case ("long", LongType | TimestampType | TimestampNTZType) =>
            r => Long.box(r.getLong(i))
          case ("long", IntegerType) => r => Long.box(r.getInt(i).toLong)
          case ("string", StringType) => r => r.getUTF8String(i).toString
          case (a, dt) => throw new UnsupportedOperationException(
            s"streaming write: partition field '$name' ($a over ${dt.sql}) " +
              "is not routable")
        }
        (r: InternalRow) => if (r.isNullAt(i)) null else get(r)
    }

  // Open writers are LRU-capped: with write.distribution-mode 'none' on
  // a partitioned table, one task can see unboundedly many tuples, and
  // an open parquet writer buffers a whole row group — uncapped, that is
  // an executor OOM at scale. At the cap the least-recently-written
  // tuple's file is CLOSED (multiple files per tuple is Iceberg-legal);
  // a re-encountered tuple just opens a fresh file. `files` records
  // every file ever opened (closed + open) for commit/abort.
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, GraftParquetWrite.RowFileWriter]
  private val files =
    scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, Any])]
  private var fileSeq = 0

  // CDC apply: strip-change-column projection for data rows, key
  // projection + one keys-only scratch writer per task for tombstones
  private val dataProj =
    if (f.dataProjExprs.isEmpty) null
    else UnsafeProjection.create(f.dataProjExprs.toArray)
  private val keyProj =
    if (f.keyProjExprs.isEmpty) null
    else UnsafeProjection.create(f.keyProjExprs.toArray)
  private var tombWriter: GraftParquetWrite.RowFileWriter = null
  private var tombPath: String = null

  private def isTombstone(row: InternalRow): Boolean =
    f.changeIdx >= 0 && !row.isNullAt(f.changeIdx) && {
      val v = row.getUTF8String(f.changeIdx).toString
      v.equalsIgnoreCase("delete") || v.equalsIgnoreCase("d")
    }

  // ---- intra-epoch ordering (upsert-ordinal-column) ----------------------
  // Rows arrive clustered by key, sorted by (key, ordinal): buffer the
  // current key run's WINNING action and write only on run change/commit.
  // Ties (a CDC update pair shares its commit's ordinal) resolve
  // delete-first — the pair's insert supersedes its delete.
  private var pendingKey: InternalRow = null
  private var pendingRow: InternalRow = null
  private var pendingIsTomb = false
  private var pendingOrd = 0L

  private def ordOf(row: InternalRow): Long = {
    require(!row.isNullAt(f.ordinalIdx),
      "streaming upsert: the upsert-ordinal-column must be non-null on " +
        "every feed row")
    if (f.ordinalIsLong) row.getLong(f.ordinalIdx)
    else row.getInt(f.ordinalIdx).toLong
  }

  private def flushPending(): Unit = if (pendingRow != null) {
    writeResolved(pendingRow, pendingIsTomb)
    pendingRow = null
    pendingKey = null
  }

  override def write(row: InternalRow): Unit = {
    if (f.ordinalIdx < 0) { writeResolved(row, isTombstone(row)); return }
    val key = keyProj(row) // reused buffer; pendingKey is a copy
    val ord = ordOf(row)
    val tomb = isTombstone(row)
    if (pendingKey == null || pendingKey != key) {
      // copy BEFORE flushing: a tombstone flush re-projects through the
      // same keyProj buffer `key` points into, so copying after would
      // capture the FLUSHED row's key and split the new run in two
      val keyCopy = key.copy()
      flushPending()
      pendingKey = keyCopy
      pendingRow = row.copy()
      pendingIsTomb = tomb
      pendingOrd = ord
    } else if (ord > pendingOrd || (ord == pendingOrd && pendingIsTomb && !tomb)) {
      pendingRow = row.copy()
      pendingIsTomb = tomb
      pendingOrd = ord
    } else if (ord == pendingOrd && !pendingIsTomb && !tomb) {
      // two DATA actions at ONE ordinal: an idempotent duplicate is
      // harmless, but DIFFERING table data is genuinely ambiguous — the
      // arrival order within an equal-ordinal sort is arbitrary, so
      // keeping either would commit a run-dependent value. Fail loudly,
      // matching the strictness the no-ordinal path's duplicate-key
      // check gives the same feed.
      val a = (if (dataProj == null) row else dataProj(row)).copy()
      val b = if (dataProj == null) pendingRow else dataProj(pendingRow)
      require(a == b,
        s"streaming upsert: two different rows for one key at ordinal " +
          s"$ord — the upsert-ordinal-column must order a key's actions " +
          "totally (or deduplicate the feed)")
    }
  }

  private def writeResolved(row: InternalRow, tomb: Boolean): Unit = {
    if (tomb) {
      if (tombWriter == null) {
        tombPath = s"${f.dataDir}/b$epochId-p$partitionId-t$taskId-tomb.parquet"
        tombWriter = f.tombstoneParquet.get.open(tombPath, partitionId, taskId)
      }
      tombWriter.write(keyProj(row))
      return
    }
    val (key, tuple) =
      if (projection == null) ("", Map.empty[String, Any])
      else {
        val p = projection(row)
        val vs = extractors.map(_(p))
        // length-prefixed so no string value can alias a tuple boundary;
        // NULL gets its own marker (String.valueOf(null) would collide
        // with the literal string "null" and merge two distinct tuples
        // into one file)
        (vs.map {
          case null => "N"
          case v => val s = String.valueOf(v); s"V${s.length}:$s"
        }.mkString,
          f.specFields.map(_._1).zip(vs).toMap)
      }
    val w = open.get(key) match {
      case Some(w0) =>
        // refresh recency (Scala's LinkedHashMap is insertion-ordered)
        open.remove(key); open.put(key, w0); w0
      case None =>
        if (open.size >= f.maxOpenWriters) {
          val (lruKey, lruW) = open.head
          lruW.close()
          open.remove(lruKey)
        }
        val path = s"${f.dataDir}/b$epochId-p$partitionId-t$taskId-" +
          s"$fileSeq.parquet"
        fileSeq += 1
        val w0 = f.parquet.open(path, partitionId, taskId)
        open.put(key, w0)
        files += ((path, tuple))
        w0
    }
    w.write(if (dataProj == null) row else dataProj(row))
  }

  override def commit(): WriterCommitMessage = {
    flushPending() // last key run of an ordinal-resolved task
    open.values.foreach(_.close())
    open.clear()
    if (tombWriter != null) { tombWriter.close(); tombWriter = null }
    GraftStreamFilesMessage(files.toSeq,
      if (tombPath == null) Seq.empty else Seq(tombPath))
  }

  override def abort(): Unit = {
    pendingRow = null
    pendingKey = null
    open.values.foreach(w => try w.close() catch { case _: Exception => () })
    open.clear()
    if (tombWriter != null) {
      try tombWriter.close() catch { case _: Exception => () }
      tombWriter = null
    }
    (files.map(_._1) ++ Option(tombPath)).foreach { p =>
      val hp = new Path(p)
      try hp.getFileSystem(f.parquet.hadoopConf).delete(hp, false)
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}
