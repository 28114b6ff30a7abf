package graft.iceberg

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] seeded entirely from manifest entries — the scan's
  * answer to "where are the files and how big are they" without a single
  * storage round trip at plan time.
  *
  * `spark.read.parquet(paths: _*)` resolves through `InMemoryFileIndex`,
  * which re-stats every path at DataFrame construction (driver threads
  * below ~32 paths, a full listing Spark job above). The manifests
  * already recorded `file_size_in_bytes` for every entry — the reference
  * injects its manifest-known cardinality into the scan for exactly this
  * reason (iceberg_scan.cpp:140-154, `explicit_cardinality`); this index
  * extends that philosophy to file sizes, so cold planning over an
  * object store makes ZERO `getFileStatus`/`listStatus` calls for data
  * or delete files. At 100 TB (~800k files on S3) that is the difference
  * between minutes of redundant round trips per cold scan and none.
  *
  * Split arithmetic (`maxPartitionBytes` packing), broadcast-join sizing
  * (`sizeInBytes`), and `_metadata.file_path` provenance all flow from
  * the manifest-recorded lengths, which the writer stamped from the real
  * files — the same numbers a stat would return.
  *
  * Partition pruning happened upstream (manifest/entry-level, P2/§2.10),
  * so the relation is unpartitioned and `listFiles` ignores filters;
  * row-group pruning still happens reader-side from the pushed filters.
  */
private[graft] final class ManifestFileIndex(
    files: Seq[(Path, Long)], mkStatuses: () => Seq[FileStatus])
    extends FileIndex {
  override val rootPaths: Seq[Path] = files.map(_._1)
  // statuses materialize LAZILY (r18, ADVICE r17): paths/sizes answer
  // planning-time questions (stats, root paths) without them, so a
  // query the optimizer answers from metadata alone — e.g. the
  // COUNT(*) rewrite discarding the spliced scan — never pays the
  // per-file mtime fold the statuses embed
  private lazy val statuses: Array[FileStatus] = mkStatuses().toArray
  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  override def inputFiles: Array[String] =
    files.map(_._1.toString).toArray
  override def refresh(): Unit = ()
  override val sizeInBytes: Long = files.map(_._2).sum
  override def partitionSchema: StructType = new StructType()
  override def metadataOpsTimeNs: Option[Long] = Some(0L)
}

private[graft] object ManifestFileIndex {

  /** A parquet/orc relation over manifest-known `(resolved path, size)`
    * pairs with a declared read schema. Returns None when any size is
    * unrecorded (≤ 0) — a zero-length `FileStatus` would silently yield
    * no splits (row loss), so the caller falls back to the statting
    * reader for such legacy metadata. Duplicate paths are preserved
    * (read twice), matching `spark.read.parquet`'s multi-path semantics.
    */
  def relation(
      spark: SparkSession, fmt: String, files: Seq[(String, Long)],
      schema: StructType, conf: Configuration,
      // `_metadata.file_modification_time` for the synthesized statuses.
      // The statting InMemoryFileIndex returned each file's real mtime;
      // manifests don't record one, so each file gets its COMMITTING
      // snapshot's timestamp (entry `snapshot_id`, inherited from the
      // manifest's `added_snapshot_id` — already in loaded metadata, no
      // extra round trip) via `mtimeByPath`; a file with no resolvable
      // committing snapshot falls back to `mtimeMs`, the SCANNED
      // snapshot's timestamp — an upper bound, since every visible file
      // was finalized at-or-before that commit instant. Round 16: the
      // per-file map keeps unchanged files' mtimes STABLE across
      // unrelated commits instead of drifting forward.
      // 0 (no snapshot in scope) keeps the epoch placeholder.
      // BY-NAME (r18, ADVICE r17): the O(entries) fold behind the map
      // runs only if the index ever materializes statuses — once per
      // relation, and never for plans the optimizer answers scan-free.
      mtimeMs: Long = 0L,
      mtimeByPath: => Map[String, Long] = Map.empty): Option[DataFrame] = {
    if (files.isEmpty || files.exists(_._2 <= 0L)) None
    else {
      val fileFormat = fmt match {
        case "parquet" => new ParquetFileFormat()
        case "orc"     => new OrcFileFormat()
        case other     => return None // avro has its own V2 source
      }
      val qualified = files.map { case (p, len) =>
        (p, new Path(IcebergIO.qualified(p, conf)), len)
      }
      lazy val mtimes = mtimeByPath // forced at most once per relation
      val mkStatuses = () => qualified.map { case (raw, qp, len) =>
        new FileStatus(len, false, 1, 134217728L,
          mtimes.getOrElse(raw, mtimeMs), qp)
      }
      val rel = HadoopFsRelation(
        location = new ManifestFileIndex(
          qualified.map(t => (t._2, t._3)), mkStatuses),
        partitionSchema = new StructType(),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = fileFormat,
        options = Map.empty[String, String])(spark)
      Some(spark.baseRelationToDataFrame(rel))
    }
  }
}
