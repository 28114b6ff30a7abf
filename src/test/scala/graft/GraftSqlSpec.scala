package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sql.GraftSql

/** SQL TVF surface — mirrors the reference's SQL tests
  * (test/sql/iceberg_scan.test:18-38, iceberg_snapshots.test:15-19) run
  * through `spark.sql(...)` instead of the Scala API. */
class GraftSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Ref = "/root/reference/data/iceberg"
  private val Lineitem = s"$Ref/lineitem_iceberg"

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("iceberg_scan latest count through SQL (iceberg_scan.test:18)") {
    val n = spark.sql(
      s"SELECT count(*) FROM iceberg_scan('$Lineitem', allow_moved_paths => true)")
      .collect()(0).getLong(0)
    assert(n === 51793L)
  }

  test("iceberg_scan by snapshot id through SQL (iceberg_scan.test:24)") {
    val n = spark.sql(
      s"SELECT count(*) FROM iceberg_scan('$Lineitem', 3776207205136740581, allow_moved_paths => true)")
      .collect()(0).getLong(0)
    assert(n === 60175L)
  }

  test("iceberg_scan by timestamp through SQL (iceberg_scan.test:30-38)") {
    val n = spark.sql(
      s"""SELECT count(*) FROM iceberg_scan('$Lineitem',
            TIMESTAMP '2023-02-15 15:08:14.73', allow_moved_paths => true)""")
      .collect()(0).getLong(0)
    assert(n === 51793L)
  }

  test("iceberg_scan resolves to the DSv2 relation: metadata count is scan-free") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files
      .createTempDirectory("graft_sql_v2_").toString + "/t"
    import spark.implicits._
    graft.iceberg.IcebergWriter.write(
      (1 to 321).map(i => (i.toLong, s"r$i")).toDF("id", "s"), table)
    val q = spark.sql(
      s"SELECT count(*) AS c, min(id) AS lo, max(id) AS hi FROM iceberg_scan('$table')")
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((321L, 1L, 321L)))
    q.collect()
    val scans = PlanWalk.collect(q.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b: Any
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f: Any
    }
    assert(scans.isEmpty,
      s"TVF metadata count must plan no scan:\n${q.queryExecution.executedPlan}")
    // row results still exact through the spliced native plan
    assert(spark.sql(s"SELECT sum(id) FROM iceberg_scan('$table') WHERE id <= 10")
      .head.getLong(0) === 55L)
  }

  test("_metadata virtual columns still resolve over the DSv2 TVF path (S7)") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft_sql_meta_").toString + "/t"
    graft.iceberg.IcebergWriter.write(
      (1 to 200).map(i => (i.toLong, s"r$i")).toDF("id", "s"), table)
    graft.iceberg.IcebergWriter.write(
      (201 to 250).map(i => (i.toLong, s"r$i")).toDF("id", "s"), table)
    // file_path: one distinct path per data file, and row counts add up
    val rows = spark.sql(
      s"""SELECT _metadata.file_path AS p, count(*) AS n
          FROM iceberg_scan('$table') GROUP BY 1""").collect()
    assert(rows.length >= 2, "two appends => at least two files")
    assert(rows.map(_.getLong(1)).sum === 250L)
    // file_modification_time rides the per-file commit instants
    val mt = spark.sql(
      s"""SELECT count(DISTINCT _metadata.file_modification_time)
          FROM iceberg_scan('$table')""").head.getLong(0)
    assert(mt >= 2L, "two commits => two distinct commit instants")
    // qualified access resolves too, and mixes with data columns
    val q = spark.sql(
      s"""SELECT t._metadata.file_path AS p, max(t.id) AS m
          FROM iceberg_scan('$table') t GROUP BY 1""").collect()
    assert(q.map(_.getLong(1)).max === 250L)
  }

  test("iceberg_scan mode=list_files through SQL (iceberg_scan.cpp:280-282)") {
    val rows = spark.sql(
      s"""SELECT file, type FROM iceberg_scan('$Lineitem',
            allow_moved_paths => true, mode => 'list_files')""").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "data")
    assert(rows(0).getString(0).endsWith(
      "00041-414-f3c73457-bbd6-4b92-9c15-17b241171b16-00001.parquet"))
  }

  test("iceberg_snapshots through SQL (iceberg_snapshots.test:15-19)") {
    val ids = spark.sql(
      s"SELECT snapshot_id FROM iceberg_snapshots('$Lineitem') ORDER BY sequence_number")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(3776207205136740581L, 7635660646343998149L))
  }

  test("iceberg_metadata through SQL (iceberg_metadata.test:13-17)") {
    val n = spark.sql(
      s"""SELECT count(*) FROM iceberg_metadata('$Lineitem',
            allow_moved_paths => true)""").collect()(0).getLong(0)
    assert(n === 2L)
  }

  test("filter through the SQL scan is pushed to the parquet read") {
    val df = spark.sql(
      s"""SELECT l_orderkey FROM iceberg_scan('$Lineitem', allow_moved_paths => true)
          WHERE l_extendedprice > 90000""")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_extendedprice)"),
      s"expected pushed filter in plan:\n$physical")
  }

  test("version and codec named arguments through SQL") {
    val n1 = spark.sql(
      s"""SELECT count(*) FROM iceberg_scan('$Lineitem',
            allow_moved_paths => true, version => '1')""")
      .collect()(0).getLong(0)
    assert(n1 === 60175L)
    val gz = s"$Ref/lineitem_iceberg_gz"
    val n2 = spark.sql(
      s"""SELECT count(*) FROM iceberg_scan('$gz',
            allow_moved_paths => true, metadata_compression_codec => 'gzip')""")
      .collect()(0).getLong(0)
    assert(n2 === 111968L)
  }

  test("unknown named argument errors") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM iceberg_scan('$Lineitem', bogus_param => 1)").collect()
    }
    assert(e.getMessage.contains("unknown named argument") ||
           e.getMessage.contains("bogus_param"))
  }

  test("iceberg_changelog through SQL surfaces net inserts and deletes") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlcdc_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val snap1 = graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.delete(spark, table, col("n_nationkey") === 3)
    val rows = spark.sql(
      s"SELECT _change_type, count(*) AS cnt FROM iceberg_changelog('$table', $snap1) GROUP BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows === Map("delete" -> 1L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM iceberg_changelog('$table')").collect()
    }
    assert(e.getMessage.contains("from_snapshot_id"))

    // per-commit attribution through SQL
    val attributed = spark.sql(
      s"""SELECT _commit_snapshot_id, _change_type, count(*) AS cnt
          FROM iceberg_changelog('$table', $snap1, by_snapshot => true)
          GROUP BY 1, 2""").collect()
    assert(attributed.length === 1 && attributed(0).getString(1) === "delete")

    // bounds may be ref NAMES: CDC between two tagged releases
    graft.iceberg.IcebergWriter.createTag(spark, table, "start", at = Some(snap1))
    val byName = spark.sql(
      s"SELECT * FROM iceberg_changelog('$table', 'start', 'main')").collect()
    val byIdRows = spark.sql(
      s"SELECT * FROM iceberg_changelog('$table', $snap1)").collect()
    assert(byName.length === byIdRows.length)

    // ...or TIMESTAMPS: CDC between two points in time (from = snap1's
    // commit instant resolves to snap1 itself)
    val ts1 = spark.sql(
      s"""SELECT timestamp_ms FROM iceberg_snapshots('$table')
          WHERE snapshot_id = $snap1""").collect()(0)
      .getAs[java.time.LocalDateTime](0)
    val byTs = spark.sql(
      s"""SELECT * FROM iceberg_changelog('$table',
            TIMESTAMP '${java.sql.Timestamp.valueOf(ts1)}')""").collect()
    assert(byTs.length === byIdRows.length)
  }

  test("iceberg_manifests through SQL aggregates per content class") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlmf_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.delete(spark, table, col("n_nationkey") === 3)
    val rows = spark.sql(
      s"""SELECT content, sum(added_files_count), sum(added_rows_count)
          FROM iceberg_manifests('$table') GROUP BY 1 ORDER BY 1""").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0, 1L, nation.count()), (1, 1L, 1L)))
  }

  test("iceberg_position_deletes and iceberg_orphan_files through SQL") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlpd_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.delete(spark, table, col("n_nationkey") === 3)
    val pd = spark.sql(
      s"SELECT count(*) FROM iceberg_position_deletes('$table')")
      .head().getLong(0)
    assert(pd === 1L)
    assert(spark.sql(
      s"SELECT count(*) FROM iceberg_orphan_files('$table')")
      .head().getLong(0) === 0L)
    graft.iceberg.IcebergWriter.compact(spark, table)
    graft.iceberg.IcebergWriter.expireSnapshots(spark, table, keep = 1)
    assert(spark.sql(
      s"SELECT count(*) FROM iceberg_orphan_files('$table')")
      .head().getLong(0) > 0L)
  }

  test("iceberg_all_manifests and iceberg_all_files through SQL") {
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlall_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.write(nation, table)
    assert(spark.sql(
      s"SELECT count(*) FROM iceberg_all_manifests('$table')")
      .head().getLong(0) === 3L) // 1 + 2
    assert(spark.sql(
      s"""SELECT count(*) FROM iceberg_all_files('$table')
          WHERE content = 0""").head().getLong(0) === 3L)
  }

  test("iceberg_entries shows DELETED tombstone markers the files listing hides") {
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlentries_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.delete(spark, table,
      org.apache.spark.sql.functions.col("n_nationkey") === 0)
    graft.iceberg.IcebergWriter.compact(spark, table)
    val byStatus = spark.sql(
      s"""SELECT status, count(*) AS n FROM iceberg_entries('$table')
          GROUP BY status""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // compaction marks the pre-compact data file DELETED and adds the
    // rewritten file — both generations visible here (the delete-file
    // manifest is dropped from the list outright, not tombstoned)
    assert(byStatus.getOrElse("DELETED", 0L) >= 1, byStatus.toString)
    assert(byStatus.getOrElse("ADDED", 0L) >= 1, byStatus.toString)
    // the files listing hides tombstones: strictly fewer rows
    val filesN = spark.sql(
      s"SELECT count(*) FROM iceberg_files('$table')").head().getLong(0)
    val entriesN = spark.sql(
      s"SELECT count(*) FROM iceberg_entries('$table')").head().getLong(0)
    assert(entriesN > filesN, s"entries=$entriesN files=$filesN")
  }

  test("runtime registration on an extension-less session") {
    val fresh = spark.newSession()
    GraftSql.register(fresh)
    val n = fresh.sql(
      s"SELECT count(*) FROM iceberg_scan('$Lineitem', allow_moved_paths => true)")
      .collect()(0).getLong(0)
    assert(n === 51793L)
  }

  test("iceberg_add_files and iceberg_row_count through SQL") {
    import org.apache.spark.sql.functions.col
    val source = java.nio.file.Files
      .createTempDirectory("graft_sqladd_src_").toString
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    // foreign-style export: no field ids
    nation.write.mode("overwrite").parquet(source)
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqladd_").toString + "/t"

    val add = spark.sql(
      s"SELECT * FROM iceberg_add_files('$table', '$source')").collect()(0)
    assert(add.getLong(0) === 1L) // first snapshot
    assert(add.getLong(1) >= 1L)  // files registered

    val rc = spark.sql(s"SELECT * FROM iceberg_row_count('$table')").collect()(0)
    assert(rc.getLong(0) === nation.count())
    assert(rc.getBoolean(1)) // metadata-only fast path
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .collect()(0).getLong(0) === nation.count())
  }

  test("iceberg_incremental_append through SQL returns only the new rows") {
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlinc_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation.filter(col("n_nationkey") < 10), table)
    graft.iceberg.IcebergWriter.write(nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20), table)
    graft.iceberg.IcebergWriter.write(nation.filter(col("n_nationkey") >= 20), table)

    val inc = spark.sql(s"SELECT * FROM iceberg_incremental_append('$table', 1)")
    assert(inc.count() === nation.filter(col("n_nationkey") >= 10).count())
    assert(inc.agg(org.apache.spark.sql.functions.min("n_nationkey"))
      .head().get(0).toString.toLong === 10L)
    val bounded = spark.sql(s"SELECT * FROM iceberg_incremental_append('$table', 1, 2)")
    assert(bounded.agg(org.apache.spark.sql.functions.max("n_nationkey"))
      .head().get(0).toString.toLong === 19L)
  }

  test("iceberg_snapshot_summaries and iceberg_upgrade_format") {
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlsum_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.delete(spark, table, col("n_nationkey") === 3)

    val sums = spark.sql(s"SELECT * FROM iceberg_snapshot_summaries('$table')")
    assert(sums.filter(col("snapshot_id") === 1L && col("key") === "added-records")
      .head().getString(4).toLong === nation.count())
    assert(sums.filter(col("operation") === "delete").count() > 0)

    val up = spark.sql(s"SELECT * FROM iceberg_upgrade_format('$table')").head()
    assert(up.getInt(1) === 3)
    // post-upgrade the table still reads, and the v2-era delete holds
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .head().getLong(0) === nation.count() - 1)
  }

  test("table properties through SQL: set / list / unset, and they take effect") {
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlprop_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)

    spark.sql(s"SELECT * FROM iceberg_set_properties('$table', " +
      "'write.format.default', 'avro')")
    val props = spark.sql(s"SELECT * FROM iceberg_table_properties('$table')")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("write.format.default").contains("avro"))
    // the property drives behavior: a format-less append writes avro
    graft.iceberg.IcebergWriter.write(nation.limit(2), table)
    val formats = graft.iceberg.IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(formats.contains("AVRO"))
    // a metadata-only property commit: same snapshots, bumped version
    assert(spark.sql(s"SELECT * FROM iceberg_snapshots('$table')").count() === 2)

    spark.sql(s"SELECT * FROM iceberg_unset_properties('$table', " +
      "'write.format.default')")
    val after = spark.sql(s"SELECT * FROM iceberg_table_properties('$table')")
      .collect().map(_.getString(0)).toSet
    assert(!after.contains("write.format.default"))

    // engine-managed keys are refused: unsetting the name mapping would
    // silently flip a migrated table onto the field-id read path
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM iceberg_unset_properties('$table', " +
        "'schema.name-mapping.default')").collect()
    }
    assert(e.getMessage.contains("engine-managed"), e.getMessage)
  }

  test("iceberg_ancestors_of, set_ref_retention, compute_partition_stats procs") {
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlanc_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.write(nation.limit(2), table)
    graft.iceberg.IcebergWriter.write(nation.limit(1), table)

    val anc = spark.sql(s"SELECT * FROM iceberg_ancestors_of('$table')").collect()
    assert(anc.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L))
    assert(anc.head.getLong(1) === 2L) // parent of head
    val ancAt = spark.sql(s"SELECT * FROM iceberg_ancestors_of('$table', 2)").collect()
    assert(ancAt.map(_.getLong(0)).toSeq === Seq(2L, 1L))

    graft.iceberg.IcebergWriter.createTag(spark, table, "keepme", Some(1L))
    val ret = spark.sql(
      s"""SELECT * FROM iceberg_set_ref_retention('$table', 'keepme',
            max_ref_age_ms => 86400000)""").head()
    assert(ret.getString(0) === "keepme" && ret.getBoolean(1))
    assert(graft.iceberg.IcebergScan.loadInfo(spark, table)
      .refRetention.get("keepme").flatMap(_.maxRefAgeMs).contains(86400000L))

    val stats = spark.sql(
      s"SELECT * FROM iceberg_compute_partition_stats('$table')").head().getString(0)
    assert(stats.contains("partition-stats"))
  }

  test("row-level write operations from pure SQL: write/delete/update/merge/overwrite") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_sqlwr_").toString
    val table = s"$base/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    nation.createOrReplaceTempView("nation_src")

    // CREATE + APPEND from a view
    val w = spark.sql(
      s"SELECT * FROM iceberg_write('$table', 'nation_src')").head()
    assert(w.getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .head().getLong(0) === nation.count())

    // DELETE WHERE (MoR)
    spark.sql(
      s"SELECT * FROM iceberg_delete_where('$table', 'n_nationkey < 3')").collect()
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .head().getLong(0) === nation.count() - 3)

    // UPDATE WHERE with assignments
    spark.sql(
      s"""SELECT * FROM iceberg_update_where('$table',
            'n_nationkey = 5', 'n_name = ''RENAMED''')""").collect()
    assert(spark.sql(
      s"SELECT n_name FROM iceberg_scan('$table') WHERE n_nationkey = 5")
      .head().getString(0) === "RENAMED")

    // MERGE from a view (upsert key 5 back, insert key 100)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(5, "BACK", 1),
        org.apache.spark.sql.Row(100, "NEW", 1))),
      nation.schema).createOrReplaceTempView("nation_upserts")
    spark.sql(
      s"SELECT * FROM iceberg_merge('$table', 'nation_upserts', keys => 'n_nationkey')")
      .collect()
    assert(spark.sql(
      s"SELECT n_name FROM iceberg_scan('$table') WHERE n_nationkey = 5")
      .head().getString(0) === "BACK")
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .head().getLong(0) === nation.count() - 3 + 1)

    // OVERWRITE (unpartitioned -> full replace) from a view
    nation.limit(4).createOrReplaceTempView("nation_replacement")
    spark.sql(
      s"SELECT * FROM iceberg_overwrite_partitions('$table', 'nation_replacement')")
      .collect()
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .head().getLong(0) === 4L)

    // partitioned write via partition_by
    val t2 = s"$base/t2"
    spark.sql(
      s"""SELECT * FROM iceberg_write('$t2', 'nation_src',
            partition_by => 'n_regionkey')""").collect()
    val pruned = spark.sql(
      s"""SELECT file, type FROM iceberg_scan('$t2', mode => 'list_files',
            where => 'n_regionkey = 1')""")
      .filter(col("type") === "data").count()
    val total = spark.sql(
      s"SELECT file, type FROM iceberg_scan('$t2', mode => 'list_files')")
      .filter(col("type") === "data").count()
    assert(pruned < total, s"partition pruning: $pruned vs $total files")
  }

  test("maintenance procedures through SQL: the CALL-surface lifecycle") {
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files
      .createTempDirectory("graft_sqlproc_").toString + "/t"
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    graft.iceberg.IcebergWriter.write(nation, table)
    graft.iceberg.IcebergWriter.write(nation.limit(2), table)
    graft.iceberg.IcebergWriter.write(nation.limit(1), table)

    // tag + branch + analyze + manifests rewrite return their summaries
    val tag = spark.sql(s"SELECT * FROM iceberg_create_tag('$table', 'v1', 1)").collect()(0)
    assert(tag.getString(0) === "v1" && tag.getLong(1) === 1L)
    val br = spark.sql(s"SELECT * FROM iceberg_create_branch('$table', 'dev')").collect()(0)
    assert(br.getString(0) === "dev" && br.getLong(1) === 3L)
    val ndv = spark.sql(s"SELECT * FROM iceberg_analyze('$table')").collect()
    assert(ndv.map(_.getString(0)).toSet ===
      nation.schema.fieldNames.toSet)
    val rm = spark.sql(s"SELECT * FROM iceberg_rewrite_manifests('$table')").collect()(0)
    assert(rm.getBoolean(0))

    // rollback via SQL procedure; tag + branch still resolve
    val rb = spark.sql(
      s"SELECT * FROM iceberg_rollback_to_snapshot('$table', 2)").collect()(0)
    assert(rb.getLong(0) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .collect()(0).getLong(0) === nation.count() + 2)

    // drop the dev branch, releasing its staged snapshot 3
    spark.sql(s"SELECT * FROM iceberg_drop_ref('$table', 'dev')").collect()
    val refs = spark.sql(s"SELECT ref_name FROM iceberg_refs('$table')")
      .collect().map(_.getString(0)).toSet
    assert(!refs.contains("dev") && refs.contains("v1"))

    // compact, then expire: keeps the compacted head + the v1 tag
    spark.sql(s"SELECT * FROM iceberg_compact('$table')").collect()
    val exp = spark.sql(
      s"SELECT * FROM iceberg_expire_snapshots('$table', keep => 1)").collect()(0)
    assert(exp.getLong(0) === 2L) // snapshots 2 and 3
    // neither keep nor older_than is an error
    intercept[Exception] {
      spark.sql(s"SELECT * FROM iceberg_expire_snapshots('$table')").collect()
    }

    // orphan listing: dry run lists expired snapshots' files, deletes none
    val dry = spark.sql(
      s"""SELECT * FROM iceberg_remove_orphan_files('$table',
            older_than => TIMESTAMP '2100-01-01 00:00:00', dry_run => true)""")
      .collect()
    assert(dry.nonEmpty) // snapshot-2/3 appends are orphan candidates
    val conf = spark.sessionState.newHadoopConf()
    dry.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r.getString(0))
      assert(p.getFileSystem(conf).exists(p)) // dry run deleted nothing
    }
    // real vacuum removes them; head AND the tag still read
    spark.sql(
      s"""SELECT * FROM iceberg_remove_orphan_files('$table',
            older_than => TIMESTAMP '2100-01-01 00:00:00')""").collect()
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$table')")
      .collect()(0).getLong(0) === nation.count() + 2)
    assert(spark.sql(
      s"SELECT count(*) FROM iceberg_scan('$table', snapshot_from_ref => 'v1')")
      .collect()(0).getLong(0) === nation.count())
  }
}
