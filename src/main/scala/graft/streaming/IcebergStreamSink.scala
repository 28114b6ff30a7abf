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
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val partCols = partitionBy.map(_._1).toSet
    // collectFirst is pre-order: the TOPMOST aggregation is the one whose
    // groups the sink's batches consist of. A grouping expression's OUTPUT
    // name lives in the aggregate's result list (the analyzer strips the
    // alias from groupingExpressions), so resolve each one semantically
    // against the aggregate's projected expressions.
    val grouping = events.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a.groupingExpressions.map { g =>
        a.aggregateExpressions.collectFirst {
          case al: Alias if al.child.semanticEquals(g)        => al.name
          case ar: AttributeReference if ar.semanticEquals(g) => ar.name
        }
      }
    }
    val ok = grouping.exists(gs =>
      gs.forall(_.isDefined) && gs.flatten.toSet == partCols)
    require(ok,
      "startOverwrite: in update/append output mode each batch must hold " +
        "WHOLE partitions, so the streaming aggregation's grouping columns " +
        s"must be exactly the partition columns (${partCols.mkString(", ")}) " +
        s"— found ${grouping.fold("no aggregation")(_.map(_.getOrElse("<unnamed expr>")).mkString(", "))}. " +
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
