package graft

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergIO, IcebergPruning, IcebergScan, IcebergWriter, ManifestReader}
import graft.iceberg.IcebergModel._

/** Round 10: spec-complete manifest lists + manifest-level pruning.
  *
  * The v2 spec (and the reference's FULL codec,
  * avro_codegen/iceberg_manifest_file_full.hpp:118-133) requires
  * `manifest_length`, `partition_spec_id`, `min_sequence_number`,
  * `added_snapshot_id`, per-status file/row counts and per-field
  * `partitions` summaries on every manifest-list record — rounds 2-9
  * wrote only the reference's 3-field partial subset. These tests pin:
  * the writer emits every required field; carried manifests keep their
  * original stats (added_snapshot_id in particular); legacy partial
  * lists self-heal on the next commit; and planning SKIPS whole
  * manifests whose summaries cannot match the scan predicates.
  */
class ManifestListSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-manifest-list").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def conf = spark.sessionState.newHadoopConf()

  private def grpDF(grp: Int, n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (grp, i.toLong, s"g$grp-r$i")).toDF("grp", "id", "label")
  }

  private def currentList(table: String): String =
    IcebergScan.selectSnapshot(spark, table, IcebergScan.Options()).manifestList

  private def decodeRaw(path: String): Seq[GenericRecord] = {
    val bytes = IcebergIO.readBytes(path, conf)
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](null, null))
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.result()
    } finally reader.close()
  }

  private def leInt(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array

  test("writer emits every v2-required manifest-list field with summaries") {
    val table = tmp("graft_mlist_full_") + "/t"
    IcebergWriter.write(grpDF(1, 7), table, partitionBy = Seq("grp" -> "identity"))

    val recs = decodeRaw(currentList(table))
    assert(recs.size === 1)
    val r = recs.head
    // field-for-field: the reference full codec's manifest_file members
    Seq("manifest_path", "manifest_length", "partition_spec_id", "content",
      "sequence_number", "min_sequence_number", "added_snapshot_id",
      "added_data_files_count", "existing_data_files_count",
      "deleted_data_files_count", "added_rows_count", "existing_rows_count",
      "deleted_rows_count", "partitions").foreach { f =>
      assert(r.getSchema.getField(f) != null, s"missing list field $f")
    }
    assert(r.get("manifest_length").asInstanceOf[Long] > 0)
    assert(r.get("partition_spec_id") === 0)
    assert(r.get("min_sequence_number") === r.get("sequence_number"))
    assert(r.get("added_data_files_count").asInstanceOf[Int] >= 1)
    assert(r.get("existing_data_files_count") === 0)
    assert(r.get("deleted_data_files_count") === 0)
    assert(r.get("added_rows_count") === 7L)
    val sums = r.get("partitions").asInstanceOf[java.util.Collection[_]]
    assert(sums.size === 1) // one summary per spec field
    val s = sums.iterator.next().asInstanceOf[GenericRecord]
    assert(s.get("contains_null") === false)
    val lo = s.get("lower_bound").asInstanceOf[ByteBuffer]
    assert(lo.order(ByteOrder.LITTLE_ENDIAN).duplicate()
      .order(ByteOrder.LITTLE_ENDIAN).getInt === 1)
  }

  test("carried manifests keep their original added_snapshot_id and counts") {
    val table = tmp("graft_mlist_carry_") + "/t"
    IcebergWriter.write(grpDF(1, 5), table, partitionBy = Seq("grp" -> "identity"))
    val snap1 = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options()).snapshotId
    IcebergWriter.write(grpDF(2, 3), table, partitionBy = Seq("grp" -> "identity"))
    val snap2 = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options()).snapshotId
    assert(snap1 !== snap2)

    val manifests = ManifestReader.readManifestList(currentList(table), conf, 2)
    assert(manifests.size === 2)
    val byAdder = manifests.flatMap(_.stats).map(_.addedSnapshotId).sorted
    assert(byAdder === Seq(snap1, snap2).sorted)
    manifests.foreach { m =>
      val st = m.stats.getOrElse(fail(s"no stats on ${m.manifestPath}"))
      assert(st.manifestLength > 0)
      assert(st.addedFilesCount >= 1)
      assert(st.partitions.isDefined)
    }
    val rows = manifests.flatMap(_.stats).map(_.addedRowsCount).sorted
    assert(rows === Seq(3L, 5L))
  }

  test("a legacy 3-field manifest list self-heals on the next commit") {
    val table = tmp("graft_mlist_legacy_") + "/t"
    IcebergWriter.write(grpDF(1, 4), table, partitionBy = Seq("grp" -> "identity"))

    // Rewrite the current list with the reference's PARTIAL writer schema
    // (iceberg_types.hpp MANIFEST_FILE_SCHEMA) — exactly what rounds 2-9
    // and the reference's own writer produce.
    val partial = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"content","type":"int"},
        {"name":"sequence_number","type":"long"}]}""")
    val listPath = new org.apache.hadoop.fs.Path(currentList(table))
    val full = decodeRaw(listPath.toString)
    val fs = listPath.getFileSystem(conf)
    val os = fs.create(listPath, true)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](partial))
    w.create(partial, os)
    try full.foreach { r =>
      val rec = new GenericData.Record(partial)
      rec.put("manifest_path", r.get("manifest_path").toString)
      rec.put("content", r.get("content"))
      rec.put("sequence_number", r.get("sequence_number"))
      w.append(rec)
    } finally w.close()
    ManifestReader.invalidatePlanningCache()
    val legacy = ManifestReader.readManifestList(listPath.toString, conf, 2)
    assert(legacy.forall(_.stats.isEmpty), "partial list must decode with no stats")

    // the next commit recomputes stats for the carried legacy manifest
    IcebergWriter.write(grpDF(2, 6), table, partitionBy = Seq("grp" -> "identity"))
    val healed = ManifestReader.readManifestList(currentList(table), conf, 2)
    assert(healed.size === 2)
    healed.foreach { m =>
      val st = m.stats.getOrElse(fail(s"carried manifest not healed: ${m.manifestPath}"))
      assert(st.manifestLength > 0)
      assert(st.partitions.isDefined, "healed stats must recover partition summaries")
    }
    assert(healed.flatMap(_.stats).map(_.addedRowsCount).sorted === Seq(4L, 6L))
    assert(IcebergScan.scan(spark, table).count() === 10)
  }

  test("a partition-filtered first-touch plan skips non-matching manifests") {
    val table = tmp("graft_mlist_prune_") + "/t"
    // 6 commits → 6 data manifests, each covering one identity partition
    (1 to 6).foreach(g =>
      IcebergWriter.write(grpDF(g, 4), table, partitionBy = Seq("grp" -> "identity")))
    assert(ManifestReader.readManifestList(currentList(table), conf, 2).size === 6)

    ManifestReader.invalidatePlanningCache()
    val (d0, p0) = ManifestReader.manifestPruneStats
    val out = IcebergScan.scanFiltered(spark, table, col("grp") === 3)
    assert(out.count() === 4)
    assert(out.select("label").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().forall(_.startsWith("g3-")))
    val (d1, p1) = ManifestReader.manifestPruneStats
    assert(p1 - p0 === 5, s"expected 5 manifests pruned, got ${p1 - p0}")
    assert(d1 - d0 === 1, s"expected 1 manifest decoded, got ${d1 - d0}")

    // range + null-op predicates stay conservative and correct
    ManifestReader.invalidatePlanningCache()
    val (d2, p2) = ManifestReader.manifestPruneStats
    val ranged = IcebergScan.scanFiltered(spark, table, col("grp") >= 5)
    assert(ranged.count() === 8)
    val (d3, p3) = ManifestReader.manifestPruneStats
    assert(p3 - p2 === 4)
    assert(d3 - d2 === 2)

    // unfiltered scan after a partial plan still sees everything
    ManifestReader.invalidatePlanningCache()
    assert(IcebergScan.scan(spark, table).count() === 24)
  }

  test("cross-spec merged manifests claim no bounds — pre-evolution rows survive pruning") {
    val table = tmp("graft_mlist_xspec_") + "/t"
    // commit 1: UNPARTITIONED, rows with grp = 7 (outside the later range)
    IcebergWriter.write(grpDF(7, 4), table)
    // evolve to identity(grp) and stack commits past the manifest-merge
    // threshold (10) so a MERGED manifest spans both specs
    (1 to 11).foreach(g =>
      IcebergWriter.write(grpDF(g % 6 + 1, 2), table,
        partitionBy = Seq("grp" -> "identity")))
    ManifestReader.invalidatePlanningCache()
    val manifests = ManifestReader.readManifestList(currentList(table), conf, 2)
    // the merge fired (fewer manifests than commits)
    assert(manifests.size < 12)
    // every manifest holding an old-spec (grp-less) entry must be
    // unconstrained on grp: absent values ⇒ no bounds + containsNull
    manifests.filter(_.content == 0).foreach { m =>
      val entries = ManifestReader.readManifestEntries(m.manifestPath, conf, 2)
      if (entries.exists(e => e.content == 0 && !e.partition.contains("grp")))
        m.stats.flatMap(_.partitions).toSeq.flatten.foreach { s =>
          assert(s.lowerBound.isEmpty && s.upperBound.isEmpty && s.containsNull,
            s"merged manifest ${m.manifestPath} claims grp bounds over " +
              "an unconstrained old-spec entry")
        }
    }
    // the actual gate: a filtered scan for the pre-evolution value
    // returns its rows (round-10 review: summaries over merged manifests
    // used to claim bounds from partitioned entries only)
    val out = IcebergScan.scanFiltered(spark, table, col("grp") === 7)
    assert(out.count() === 4, "pre-evolution rows were pruned away")
  }

  test("parquet entries record row-group split_offsets (spec field 132)") {
    val table = tmp("graft_mlist_split_") + "/t"
    IcebergWriter.write(grpDF(1, 50), table)
    ManifestReader.invalidatePlanningCache()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())
    val meta = ManifestReader.loadTable(table, snap, conf, allowMovedPaths = false)
    val entries = meta.entries.flatMap(_._2)
    assert(entries.nonEmpty)
    entries.foreach { e =>
      assert(e.splitOffsets.nonEmpty, s"${e.filePath} has no split_offsets")
      // first row group starts just past the PAR1 magic
      assert(e.splitOffsets.head >= 4 && e.splitOffsets.head < 1024)
      assert(e.splitOffsets == e.splitOffsets.sorted)
    }
  }

  test("foreign (iceberg-java) manifest lists decode their full stats") {
    // the reference's pyspark-written fixture: real iceberg-java lists
    // carry every v2 field — our reader must surface them, and a filtered
    // scan over the (unpartitioned) table must stay exact with manifest
    // pruning active in the planner
    val table = "/root/reference/data/iceberg/lineitem_iceberg"
    val opts = IcebergScan.Options(allowMovedPaths = true)
    val snap = IcebergScan.selectSnapshot(spark, table, opts)
    val listPath = graft.iceberg.IcebergIO.fullPath(table, snap.manifestList)
    val ms = ManifestReader.readManifestList(listPath, conf, snap.formatVersion)
    assert(ms.nonEmpty)
    ms.foreach { m =>
      val st = m.stats.getOrElse(fail(s"foreign list carries no stats: ${m.manifestPath}"))
      assert(st.manifestLength > 0)
      assert(st.addedSnapshotId > 0)
      // a manifest can be all DELETED entries (the fixture's second
      // snapshot removes a file) — count every status
      assert(st.addedFilesCount + st.existingFilesCount + st.deletedFilesCount >= 1)
    }
    ManifestReader.invalidatePlanningCache()
    val filtered = IcebergScan.scanFiltered(spark, table,
      col("l_orderkey") <= 1000L, opts)
    val expected = IcebergScan.scan(spark, table, opts)
      .filter(col("l_orderkey") <= 1000L).count()
    assert(filtered.count() === expected)
  }

  test("incremental reads decode only the window's manifests") {
    val table = tmp("graft_mlist_incr_") + "/t"
    (1 to 6).foreach(g => IcebergWriter.write(grpDF(g, 3), table))
    val snaps = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect()
    assert(snaps.length === 6)
    val fromId = snaps(4).getAs[Long]("snapshot_id") // floor = 5th commit
    ManifestReader.invalidatePlanningCache()
    val (d0, p0) = ManifestReader.manifestPruneStats
    val rows = IcebergScan.incrementalAppend(spark, table, fromId)
      .select("label").collect().map(_.getString(0))
    assert(rows.toSet === Set("g6-r1", "g6-r2", "g6-r3"))
    val (d1, p1) = ManifestReader.manifestPruneStats
    assert(d1 - d0 === 1, s"decoded ${d1 - d0} manifests for a 1-commit window")
    assert(p1 - p0 === 5)
  }

  test("NaN rows survive double range pruning (spec nan_value_counts)") {
    import spark.implicits._
    import graft.iceberg.IcebergPruning.{ColPredicate, Gt}
    // clean double column: parquet stats decode non-NaN → the writer
    // PROVES a zero NaN count and records it → >/>= bounds pruning stays
    // active (file skipped for an out-of-range predicate)
    val t1 = tmp("graft_nan_clean_") + "/t"
    IcebergWriter.write((1 to 20).map(i => (i.toLong, i * 1.0)).toDF("id", "x"), t1)
    ManifestReader.invalidatePlanningCache()
    val snap1 = IcebergScan.selectSnapshot(spark, t1, IcebergScan.Options())
    val e1 = ManifestReader.loadTable(t1, snap1, conf, false).entries.flatMap(_._2).head
    val xId = snap1.schema.find(_.name == "x").get.id
    assert(e1.nanCounts.get(xId).contains(0L), s"nan count not recorded: ${e1.nanCounts}")
    val kept1 = IcebergScan.scan(spark, t1, IcebergScan.Options(
      mode = "list_files", filters = Seq(ColPredicate("x", Gt, 100.0))))
      .filter(col("type") === "data").count()
    assert(kept1 === 0, "clean-column file not pruned for x > 100")

    // NaN-bearing file: parquet min/max NaN-poison → no bounds, no
    // provable count → the file is KEPT and the NaN row (which satisfies
    // x > 100 under Spark's NaN-is-greatest ordering) comes back
    val t2 = tmp("graft_nan_rows_") + "/t"
    IcebergWriter.write(Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.5))
      .toDF("id", "x"), t2)
    ManifestReader.invalidatePlanningCache()
    val got = IcebergScan.scanFiltered(spark, t2, col("x") > 100.0)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L), s"NaN row pruned away: got $got")
  }

  test("manifestMayMatch: transform-aware, conservative on unknowns") {
    val schema = Seq(
      Column(1, "grp", org.apache.spark.sql.types.IntegerType, required = false),
      Column(2, "name", org.apache.spark.sql.types.StringType, required = false))
    val spec = Seq(PartitionFieldSpec("grp", "identity", sourceId = 1, fieldId = 1000))
    def sum(lo: Int, hi: Int, nulls: Boolean = false) = Seq(
      FieldSummary(containsNull = nulls,
        lowerBound = Some(leInt(lo)), upperBound = Some(leInt(hi))))
    import IcebergPruning._
    def p(op: Op, v: Any) = Seq(ColPredicate("grp", op, v))

    assert(manifestMayMatch(sum(2, 5), spec, schema, p(Eq, 3)))
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(Eq, 7)))
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(Lt, 2)))
    assert(manifestMayMatch(sum(2, 5), spec, schema, p(Le, 2)))
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(Gt, 5)))
    assert(manifestMayMatch(sum(2, 5), spec, schema, p(Ge, 5)))
    // In is a disjunction of Eq; empty In can match nothing
    assert(manifestMayMatch(sum(2, 5), spec, schema, p(In, Seq(7, 4))))
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(In, Seq(7, 8))))
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(In, Seq.empty[Int])))
    // IsNull keys off contains_null (all transforms map null → null)
    assert(!manifestMayMatch(sum(2, 5), spec, schema, p(IsNull, null)))
    assert(manifestMayMatch(sum(2, 5, nulls = true), spec, schema, p(IsNull, null)))
    // predicates on unpartitioned columns never prune at manifest level
    assert(manifestMayMatch(sum(2, 5), spec, schema,
      Seq(ColPredicate("name", Eq, "zzz"))))
    // missing bounds → conservative keep
    assert(manifestMayMatch(Seq(FieldSummary(containsNull = false)), spec, schema, p(Eq, 99)))
    // contains_nan on a float/double identity field disables pruning:
    // Iceberg excludes NaN from bounds, and NaN sorts above every value
    // in Spark — bounds cannot rule the manifest out (round-10 review)
    val dblSchema = Seq(Column(1, "score", org.apache.spark.sql.types.DoubleType, required = false))
    val dblSpec = Seq(PartitionFieldSpec("score", "identity", sourceId = 1, fieldId = 1000))
    def dblBytes(v: Double) = java.nio.ByteBuffer.allocate(8)
      .order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array
    val nanSum = Seq(FieldSummary(containsNull = false, containsNan = Some(true),
      lowerBound = Some(dblBytes(1.0)), upperBound = Some(dblBytes(1.0))))
    assert(manifestMayMatch(nanSum, dblSpec, dblSchema,
      Seq(ColPredicate("score", Gt, 5.0))))
    val noNanSum = Seq(FieldSummary(containsNull = false, containsNan = Some(false),
      lowerBound = Some(dblBytes(1.0)), upperBound = Some(dblBytes(1.0))))
    assert(!manifestMayMatch(noNanSum, dblSpec, dblSchema,
      Seq(ColPredicate("score", Gt, 5.0))))

    // day-transform: Lt widens to the whole ordinal bucket
    val tsSchema = Seq(Column(1, "ts", org.apache.spark.sql.types.TimestampType, required = false))
    val daySpec = Seq(PartitionFieldSpec("ts_day", "day", sourceId = 1, fieldId = 1000))
    val d20 = java.time.LocalDate.of(2024, 3, 20).toEpochDay.toInt
    val d25 = java.time.LocalDate.of(2024, 3, 25).toEpochDay.toInt
    val daySum = Seq(FieldSummary(containsNull = false,
      lowerBound = Some(leInt(d20)), upperBound = Some(leInt(d25))))
    val mar22micros = java.time.LocalDate.of(2024, 3, 22)
      .atStartOfDay.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    val mar28micros = java.time.LocalDate.of(2024, 3, 28)
      .atStartOfDay.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(manifestMayMatch(daySum, daySpec, tsSchema,
      Seq(ColPredicate("ts", Eq, mar22micros))))
    assert(!manifestMayMatch(daySum, daySpec, tsSchema,
      Seq(ColPredicate("ts", Eq, mar28micros))))
    assert(!manifestMayMatch(daySum, daySpec, tsSchema,
      Seq(ColPredicate("ts", Gt, mar28micros))))
  }
}
