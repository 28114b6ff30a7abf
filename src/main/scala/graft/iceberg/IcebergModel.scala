package graft.iceberg

import org.apache.spark.sql.types.DataType

/** Driver-side Iceberg metadata model.
  *
  * Mirrors the reference's structs (duckdb_iceberg
  * `src/include/iceberg_metadata.hpp:38-149`, `iceberg_types.hpp:80-199`)
  * as plain Scala case classes. Metadata files are small and fully loaded
  * on the driver — same trade-off the reference makes.
  */
object IcebergModel {

  /** One column of a snapshot schema (iceberg_metadata.hpp:38-51). */
  /** `initialDefault`/`writeDefault` are the spec-v3 column defaults
    * (Iceberg spec "Default values"): initial-default is the value rows
    * read back from files that do NOT physically contain the field
    * (decided per file from its footer, via EXISTS_DEFAULT read-schema
    * metadata — see IcebergSchemaParser.toStructType); write-default
    * fills the column when an append omits it. */
  final case class Column(
      id: Int, name: String, dataType: DataType, required: Boolean,
      initialDefault: Option[Any] = None,
      writeDefault: Option[Any] = None)

  /** A default value this engine cannot represent (foreign metadata with
    * an unsupported default type/encoding). Carried IN PLACE of the
    * value so schema construction and queries over OTHER columns keep
    * working (r19, ADVICE r18): the failure surfaces — loudly, with
    * `message` — only when the defaulted column itself is read or
    * written. */
  final case class UnsupportedDefault(message: String)

  /** One field of a partition spec (metadata.json `partition-specs`). The
    * reference parses specs with nobody consuming them (SURVEY §2.10); here
    * they drive driver-side file pruning. */
  final case class PartitionFieldSpec(
      name: String, transform: String, sourceId: Int, fieldId: Int)

  /** A table snapshot (iceberg_metadata.hpp:71-106). `properties` is the
    * table-level property map (spec "Table Metadata") — the scan keys
    * read behavior off it (`schema.name-mapping.default` for migrated
    * id-less files). */
  final case class Snapshot(
      snapshotId: Long,
      sequenceNumber: Long,
      timestampMs: Long,
      manifestList: String,
      formatVersion: Int,
      schemaId: Int,
      schema: Seq[Column],
      partitionSpec: Seq[PartitionFieldSpec] = Seq.empty,
      properties: Map[String, String] = Map.empty,
      // EVERY spec of the table keyed by spec-id (not just the default):
      // manifest-list `partition_spec_id` names which one a manifest's
      // partition summaries align to, so manifest-level pruning must
      // resolve historical specs too.
      partitionSpecsById: Map[Int, Seq[PartitionFieldSpec]] = Map.empty,
      // snapshot-id → timestamp-ms over the metadata's retained
      // snapshots, captured at parse time so per-file commit-instant
      // mtimes never re-read metadata.json during scan building.
      snapshotTimestamps: Map[Long, Long] = Map.empty)

  /** Per-partition-field value summary of one manifest (Iceberg spec
    * "Manifest Lists" `field_summary`; the reference's full codec models it
    * as r508, avro_codegen/iceberg_manifest_file_full.hpp:85-99). Bounds
    * are Iceberg single-value-serialized in the TRANSFORMED partition
    * domain; None = not recorded (prune conservatively). */
  final case class FieldSummary(
      containsNull: Boolean,
      containsNan: Option[Boolean] = None,
      lowerBound: Option[Array[Byte]] = None,
      upperBound: Option[Array[Byte]] = None)

  /** The v2-required manifest-list fields beyond path/content/seq
    * (iceberg_manifest_file_full.hpp:118-133): file length, the spec the
    * manifest's partition tuples were written under, sequence-number
    * floor, adding snapshot, per-status file/row counts, and the
    * partition summaries manifest-level pruning keys off. `partitions`
    * is None when the writer recorded no summaries (or the manifest's
    * fields could not be aligned to a recorded spec — counts stay valid,
    * pruning skips it). */
  final case class ManifestStats(
      manifestLength: Long,
      partitionSpecId: Int,
      minSequenceNumber: Long,
      addedSnapshotId: Long,
      addedFilesCount: Int,
      existingFilesCount: Int,
      deletedFilesCount: Int,
      addedRowsCount: Long,
      existingRowsCount: Long,
      deletedRowsCount: Long,
      partitions: Option[Seq[FieldSummary]] = None)

  /** Manifest-list entry (iceberg_types.hpp:80-118). content: 0=DATA 1=DELETE.
    * `stats` carries the v2 full-schema fields when the list recorded them
    * (graft round-10 writer, iceberg-java); None on lists from the
    * reference's partial 3-field writer or older graft tables. */
  final case class Manifest(manifestPath: String, sequenceNumber: Long, content: Int,
      stats: Option[ManifestStats] = None)

  /** Manifest entry = one data/delete file (iceberg_types.hpp:159-199).
    * status: 0=EXISTING 1=ADDED 2=DELETED;
    * content: 0=DATA 1=POSITION_DELETES 2=EQUALITY_DELETES.
    *
    * `partition` (spec-field name → value) and `lowerBounds`/`upperBounds`
    * (Iceberg field id → single-value-serialized bytes) are the
    * decoded-but-unused fields of the reference's full Avro schema
    * (avro_codegen/iceberg_manifest_entry_full.hpp:306-353); this engine
    * consumes them for file skipping. Empty when the writer omitted them.
    *
    * `sequenceNumber` is the spec's per-entry data sequence number
    * (Iceberg spec "Manifests", field 3): None means "inherit the
    * manifest's sequence number from the manifest list" — the common
    * case; Some(s) appears in MERGED manifests, whose entries came from
    * manifests committed at different sequence numbers. */
  final case class ManifestEntry(
      status: Int, content: Int, filePath: String, fileFormat: String, recordCount: Long,
      // spec data_file field 104 (required in Iceberg's full schema; the
      // reference's partial reader drops it). 0 = unknown (older graft
      // manifests predate the field) — consumers treat 0 as "no size".
      fileSizeInBytes: Long = 0L,
      partition: Map[String, Any] = Map.empty,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      // Iceberg spec null_value_counts (field id → count of nulls in that
      // column). Consumed by equality-delete scoping: a delete file with a
      // RECORDED ZERO null count for every key column can be ruled out by
      // bounds alone (a null data key then matches no delete row).
      nullCounts: Map[Int, Long] = Map.empty,
      // Iceberg spec nan_value_counts (field id → NaN count). Bounds
      // EXCLUDE NaN by spec while NaN sorts ABOVE every double in Spark,
      // so >/>= pruning on a float/double upper bound is only sound when
      // the column's NaN count is RECORDED ZERO. Absent = unknown = may
      // hold NaN = keep.
      nanCounts: Map[Int, Long] = Map.empty,
      equalityIds: Seq[Int] = Seq.empty,
      sequenceNumber: Option[Long] = None,
      // spec manifest_entry field 1: the snapshot that ADDED this entry
      // (explicit on EXISTING entries; null on fresh ADDED entries →
      // inherit the manifest's `added_snapshot_id`). Serves
      // `_metadata.file_modification_time`: a file keeps its COMMITTING
      // snapshot's timestamp instead of drifting forward with every
      // later commit.
      snapshotId: Option[Long] = None,
      // Spec v3 deletion-vector fields (Iceberg spec "Data File" fields
      // 143-145): a DV entry is content=1 with file_format=PUFFIN whose
      // blob coordinates live in the manifest — scans read the vector by
      // offset+length without touching the puffin footer.
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSizeInBytes: Option[Long] = None,
      // Spec v3 ROW LINEAGE (Iceberg spec "Row Lineage" / data-file field
      // `first_row_id`): the id of this data file's first row; row N of
      // the file has _row_id = first_row_id + N. None on v2 tables, on
      // delete entries, and on files whose ids are MATERIALIZED as a
      // column (compaction rewrites — the column is then authoritative).
      firstRowId: Option[Long] = None,
      // spec data_file field 132: byte offsets where the file can be
      // split for parallel reads — parquet row-group starts, ORC stripe
      // starts, avro block sync points. Empty = unknown (one read task).
      // Decoded by the reference's full codec
      // (iceberg_manifest_entry_full.hpp:306-353), written by nobody
      // there; here both sides are live (round 10).
      splitOffsets: Seq[Long] = Seq.empty) {
    def isDV: Boolean =
      content == 1 && fileFormat.equalsIgnoreCase("PUFFIN") && referencedDataFile.isDefined
    /** The effective data sequence number under inheritance. */
    def seqOr(manifestSeq: Long): Long = sequenceNumber.getOrElse(manifestSeq)
  }

  final case class TableMeta(
      path: String,
      snapshot: Snapshot,
      entries: Seq[(Manifest, Seq[ManifestEntry])],
      // true when a manifest-level summary filter skipped manifests during
      // planning: `entries` is a correct view FOR THAT FILTER's predicates
      // but not the snapshot's full plan — never cache it as one.
      partialPlan: Boolean = false)

  // Spec v3 ROW LINEAGE: virtual column names and their reserved field
  // ids (Iceberg spec "Row Lineage" / "Reserved field IDs"). Rewritten
  // (compacted) data files MATERIALIZE these columns under the reserved
  // ids so row ids survive rewrites; fresh files inherit from the
  // manifest's first_row_id instead.
  val RowIdCol = "_row_id"
  val LastUpdatedSeqCol = "_last_updated_sequence_number"
  val RowIdFieldId = 2147483540
  val LastUpdatedSeqFieldId = 2147483539

  // Status / content display names — reference iceberg_types.hpp:24-56.
  // (Note: the reference maps entry-content DATA → "EXISTING"; preserved.)
  def statusName(s: Int): String = s match {
    case 0 => "EXISTING"; case 1 => "ADDED"; case 2 => "DELETED"
    case other => other.toString
  }
  def manifestContentName(c: Int): String = c match {
    case 0 => "DATA"; case 1 => "DELETE"; case other => other.toString
  }
  def entryContentName(c: Int): String = c match {
    case 0 => "EXISTING"; case 1 => "POSITION_DELETES"; case 2 => "EQUALITY_DELETES"
    case other => other.toString
  }

  // Constants preserved verbatim (iceberg_metadata.hpp:26-36).
  val UnknownTableVersion = "?"
  val DefaultTableVersionFormat = "v%s%s.metadata.json,%s%s.metadata.json"
  val DefaultVersionHintFile = "version-hint.text"
  val VersionGuessingConfigKey = "unsafe_enable_version_guessing"
}
