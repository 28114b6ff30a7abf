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
  * snapshot summary and a replayed batch whose id is already committed is
  * skipped — the same summary-bookkeeping idempotence the production
  * streaming sinks for table formats use. Recovery reads the table, not
  * the checkpoint, so the guarantee holds even if the checkpoint and the
  * table disagree about progress.
  */
object IcebergStreamSink {

  /** Snapshot-summary key recording the micro-batch that committed it. */
  val BatchIdKey = "graft.streaming.batch-id"

  /** Commit one micro-batch as an append snapshot, unless a snapshot for
    * this or a later batch id already exists (replay after failure). */
  private[graft] def commitBatch(
      batch: DataFrame, batchId: Long, path: String,
      partitionBy: Seq[(String, String)]): Unit = {
    val committed = IcebergWriter
      .maxSummaryValue(batch.sparkSession, path, BatchIdKey)
      .exists(_ >= batchId)
    if (!committed && !batch.isEmpty)
      IcebergWriter.write(batch, path, partitionBy,
        summary = Map(BatchIdKey -> batchId.toString))
  }

  /** Start ingesting `events` into the Iceberg table at `path`. */
  def start(events: DataFrame, path: String, checkpoint: String,
            partitionBy: Seq[(String, String)] = Seq.empty): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, path, partitionBy)
      }
      .start()
}
