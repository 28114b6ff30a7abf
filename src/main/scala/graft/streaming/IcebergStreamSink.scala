package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.iceberg.IcebergWriter

/** Continuous ingestion from a stream into an Iceberg table — the bridge
  * between the engine's two extensions over the read-only reference
  * (SURVEY §2.9 streaming, §7.4 write path). Each micro-batch commits one
  * append snapshot, so readers always see a consistent snapshot and time
  * travel works across the ingestion history.
  *
  * Exactly-once: Structured Streaming's foreachBatch replays a batch after
  * a failure (at-least-once), so every commit records its batch id in the
  * snapshot summary under a per-sink key, and a replayed batch whose id is
  * already committed is skipped — the same summary-bookkeeping idempotence
  * the production streaming sinks for table formats use. Recovery reads
  * the table, not the checkpoint, and maintenance commits (compact/
  * expire) carry the bookkeeping forward, so the guarantee holds even if
  * the checkpoint and the table disagree about progress.
  *
  * Batch ids are scoped to the CHECKPOINT: restarting from the same
  * checkpoint replays the same ids (dedup is correct); starting a NEW
  * checkpoint restarts numbering at 0, so it must come with a new
  * `sinkId` — otherwise its early batches collide with already-committed
  * ids and are skipped as replays.
  */
object IcebergStreamSink {

  /** Snapshot-summary key for this sink's committed batch ids. */
  def batchIdKey(sinkId: String): String =
    s"${IcebergWriter.StreamBatchIdKey}.$sinkId"

  /** Commit one micro-batch as an append snapshot, unless a snapshot for
    * this or a later batch id already exists (replay after failure). */
  private[graft] def commitBatch(
      batch: DataFrame, batchId: Long, path: String,
      partitionBy: Seq[(String, String)], sinkId: String = "default",
      branch: String = "main"): Unit = {
    val key = batchIdKey(sinkId)
    val committed = IcebergWriter
      .maxSummaryValue(batch.sparkSession, path, key)
      .exists(_ >= batchId)
    if (!committed && !batch.isEmpty)
      IcebergWriter.write(batch, path, partitionBy,
        summary = Map(key -> batchId.toString), branch = branch)
  }

  /** Commit one micro-batch as an UPSERT (merge-by-key) snapshot — the
    * streaming-CDC ingestion mode: each batch's rows replace the current
    * rows with their keys (equality delete + append, O(batch) cost, no
    * target scan — see [[IcebergWriter.merge]]), so the table converges
    * to last-write-wins state per key at any table size. Within-batch
    * duplicates collapse first: with `latestBy`, the row with the
    * greatest value of that column per key wins (event-time
    * last-write-wins); without, an arbitrary one does — safe either way
    * because replayed batches are skipped whole via the batch-id
    * bookkeeping, so only one collapse outcome ever commits. The first
    * batch creates the table. */
  private[graft] def commitBatchUpsert(
      batch: DataFrame, batchId: Long, path: String, keys: Seq[String],
      partitionBy: Seq[(String, String)] = Seq.empty,
      latestBy: Option[String] = None,
      sinkId: String = "default", branch: String = "main"): Unit = {
    val key = batchIdKey(sinkId)
    val spark = batch.sparkSession
    val committed = IcebergWriter
      .maxSummaryValue(spark, path, key)
      .exists(_ >= batchId)
    if (committed || batch.isEmpty) return
    val deduped = latestBy match {
      case Some(ts) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, row_number}
        batch.withColumn("__graft_rn", row_number().over(
            Window.partitionBy(keys.map(col): _*).orderBy(col(ts).desc)))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      case None => batch.dropDuplicates(keys)
    }
    val bk = Map(key -> batchId.toString)
    if (!IcebergWriter.tableExists(spark, path))
      IcebergWriter.write(deduped, path, partitionBy, summary = bk, branch = branch)
    else
      IcebergWriter.merge(spark, path, deduped, keys, branch = branch, summary = bk)
  }

  /** Start UPSERT ingestion: every micro-batch merges by `keys` instead
    * of appending — the sink for change streams where later events
    * supersede earlier rows with the same key. Same checkpoint/sinkId
    * exactly-once contract as [[start]]. */
  def startUpsert(events: DataFrame, path: String, checkpoint: String,
                  keys: Seq[String],
                  partitionBy: Seq[(String, String)] = Seq.empty,
                  latestBy: Option[String] = None,
                  sinkId: String = "default",
                  branch: String = "main"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatchUpsert(batch, batchId, path, keys, partitionBy, latestBy,
          sinkId, branch)
      }
      .start()

  /** Commit one micro-batch as a dynamic partition OVERWRITE — the sink
    * for streaming aggregations that RECOMPUTE windows: each batch
    * atomically replaces exactly the partitions it contains (e.g. a
    * windowed count keyed by day overwrites the recomputed days, leaving
    * closed days untouched). First batch creates the table via write().
    * Same batch-id exactly-once contract as the other modes. */
  private[graft] def commitBatchOverwrite(
      batch: DataFrame, batchId: Long, path: String,
      partitionBy: Seq[(String, String)],
      sinkId: String = "default", branch: String = "main"): Unit = {
    val key = batchIdKey(sinkId)
    val spark = batch.sparkSession
    val committed = IcebergWriter
      .maxSummaryValue(spark, path, key)
      .exists(_ >= batchId)
    if (committed || batch.isEmpty) return
    val bk = Map(key -> batchId.toString)
    if (!IcebergWriter.tableExists(spark, path))
      IcebergWriter.write(batch, path, partitionBy, summary = bk, branch = branch)
    else
      IcebergWriter.overwritePartitions(batch, path, branch = branch, summary = bk)
  }

  /** Overwrite-mode safety gate: under `update` (or `append`) output
    * mode a micro-batch carries only the CHANGED (or closed) groups, and
    * the partition overwrite replaces each touched partition with
    * exactly the batch's rows — so the batch's groups must BE whole
    * partitions. If the aggregation grouped by anything finer than the
    * partition columns (e.g. day + user under a day partition), the
    * unchanged rows of a recomputed partition would be silently dropped
    * from the table. Refuse unless the grouping columns are exactly the
    * partition columns; `complete` mode re-emits every group per trigger
    * and is unconditionally safe. */
  private def requireWholePartitionBatches(
      events: DataFrame, partitionBy: Seq[(String, String)]): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{
      Alias, AttributeReference, ExprId, Expression, GetStructField}
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}
    val partCols = partitionBy.map(_._1)

    // The TOPMOST aggregation is the one whose groups the sink's batches
    // consist of. Between it and the sink the user may project — in
    // particular `group by window(ts, …)` then alias `window.start` as
    // the partition column, which IS whole-partition safe (start ↔
    // window is a bijection at fixed duration). Resolve every output
    // column of the analyzed plan down to an expression over the
    // aggregate's OUTPUT attributes, inlining intermediate projections.
    def resolve(plan: LogicalPlan)
        : Option[(Aggregate, Seq[(String, Expression)])] = plan match {
      case a: Aggregate =>
        Some((a, a.output.map(attr => attr.name -> (attr: Expression))))
      case p: Project =>
        resolve(p.child).map { case (agg, childCols) =>
          val byId = p.child.output.map(_.exprId).zip(childCols.map(_._2)).toMap
          (agg, p.projectList.map { ne =>
            val e = ne match { case al: Alias => al.child; case o => o }
            ne.name -> e.transformUp {
              case ar: AttributeReference if byId.contains(ar.exprId) =>
                byId(ar.exprId)
            }
          })
        }
      case f: Filter        => resolve(f.child)
      case s: SubqueryAlias => resolve(s.child)
      case _                => None
    }

    val checked = resolve(events.queryExecution.analyzed).map {
      case (agg, cols) =>
        // the aggregate's grouping OUTPUT attributes (the analyzer strips
        // aliases from groupingExpressions; match semantically). EVERY
        // grouping expression must resolve to an output attribute — an
        // unprojected grouping column is still a finer grouping (its
        // groups split the partition) and must fail the check.
        val groupingAttrs: Seq[Option[(ExprId, Expression)]] =
          agg.groupingExpressions.map { g =>
            agg.aggregateExpressions.collectFirst {
              case al: Alias if al.child.semanticEquals(g) =>
                al.exprId -> al.child
              case ar: AttributeReference if ar.semanticEquals(g) =>
                ar.exprId -> (ar: Expression)
            }
          }
        val groupingById: Map[ExprId, Expression] =
          groupingAttrs.flatten.toMap
        // a REAL window()/session_window() output, not just anything
        // shaped like one: the analyzer stamps the rewritten window
        // attribute with a marker metadata key (the same one
        // window_time() checks). A hand-built
        // struct(day_ts AS start, other_ts AS end) matches the shape but
        // start does not determine end there — two groups can share a
        // start, and a partition overwrite keyed on it would silently
        // drop one group's rows.
        def isWindowStruct(ar: AttributeReference): Boolean =
          (ar.metadata.contains(
             org.apache.spark.sql.catalyst.expressions.TimeWindow.marker) ||
           ar.metadata.contains(
             org.apache.spark.sql.catalyst.expressions.SessionWindow.marker)) &&
          (ar.dataType match {
            case s: StructType =>
              s.fieldNames.toSeq == Seq("start", "end") &&
                s.fields.forall(f => f.dataType == TimestampType ||
                  f.dataType == TimestampNTZType)
            case _ => false
          })
        val colByName = cols.toMap
        // each partition column must be a grouping attribute itself, or
        // the start/end field of a window grouping struct; and every
        // grouping attribute must be accounted for (a finer grouping
        // would silently drop a recomputed partition's unchanged rows)
        val covered = scala.collection.mutable.Set.empty[ExprId]
        val partsOk = partCols.forall { p =>
          colByName.get(p).exists {
            case ar: AttributeReference if groupingById.contains(ar.exprId) =>
              covered += ar.exprId; true
            case GetStructField(ar: AttributeReference, _, _)
                if groupingById.contains(ar.exprId) && isWindowStruct(ar) =>
              covered += ar.exprId; true
            case _ => false
          }
        }
        partsOk && groupingAttrs.forall(_.isDefined) &&
          groupingById.keySet.forall(covered)
    }
    require(checked.contains(true),
      "startOverwrite: in update/append output mode each batch must hold " +
        "WHOLE partitions, so every partition column " +
        s"(${partCols.mkString(", ")}) must be a grouping column of the " +
        "streaming aggregation (or the start/end of its window() group), " +
        "and the grouping must be no finer than the partition columns" +
        (if (checked.isEmpty) " — found no aggregation" else "") + ". " +
        "Group by the partition columns only, or pass outputMode=\"complete\" " +
        "(re-emits every group per trigger; safe for any grouping).")
  }

  /** Start OVERWRITE ingestion: every micro-batch replaces the
    * partitions it recomputed (ReplacePartitions per batch) — pair with
    * a windowed aggregation whose group key IS the partition column set.
    * In the default `update` mode (and in `append`) this is validated up
    * front — finer-grained groupings would silently drop the unchanged
    * rows of a recomputed partition; pass `outputMode = "complete"` to
    * run any grouping at the cost of re-emitting every group per
    * trigger. */
  def startOverwrite(events: DataFrame, path: String, checkpoint: String,
                     partitionBy: Seq[(String, String)],
                     sinkId: String = "default",
                     branch: String = "main",
                     outputMode: String = "update"): StreamingQuery = {
    if (outputMode != "complete")
      requireWholePartitionBatches(events, partitionBy)
    events.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatchOverwrite(batch, batchId, path, partitionBy, sinkId, branch)
      }
      .start()
  }

  /** Start ingesting `events` into the Iceberg table at `path`. Pair each
    * checkpoint with its own `sinkId` (see class doc). With `branch`,
    * micro-batches land on that branch (staged ingestion): main readers
    * see nothing until a `fastForward` publish, and the batch-id
    * bookkeeping still dedupes replays because the summary scan covers
    * all retained snapshots, not just main's lineage. */
  def start(events: DataFrame, path: String, checkpoint: String,
            partitionBy: Seq[(String, String)] = Seq.empty,
            sinkId: String = "default",
            branch: String = "main"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, path, partitionBy, sinkId, branch)
      }
      .start()
}
