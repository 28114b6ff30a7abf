package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (dim-side) pruning — VERDICT r13 #1. The keyed V2 scan
  * implements `SupportsRuntimeV2Filtering`: Spark's dynamic partition
  * pruning broadcasts the dim side's surviving join keys into the fact
  * scan, which re-prunes its manifest entries (partition tuples + column
  * bounds) BEFORE execution. A star join `fact ⋈ dim WHERE dim.attr = …`
  * then scans only the fact partitions the dim filter selects — at
  * 100 TB, the difference between a full fact scan and a sliver. */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private val wh = Files.createTempDirectory("graft_rf_wh_").toString

  private lazy val spark: SparkSession = {
    // broadcast joins stay ENABLED (DPP reuses the dim broadcast)
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .appName("graft-runtime-filter")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def factScans(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] = {
    df.collect()
    collect(df.queryExecution.executedPlan) { case b: BatchScanExec => b }
  }

  test("dim-side filter prunes fact partitions at runtime (DPP)") {
    spark.sql(
      "CREATE TABLE graft.db.rf_fact (dt INT, v BIGINT) PARTITIONED BY (dt)")
    // three commits → three files per day: 30 files across 10 days
    (1 to 3).foreach { i =>
      spark.sql(
        s"""INSERT INTO graft.db.rf_fact
            SELECT CAST(id % 10 AS INT) AS dt, id * $i AS v FROM range(0, 1000)""")
    }
    // NON-graft dim (a parquet view): the join cannot SPJ, so the rewrite
    // tags the fact relation "splits" — the runtime-filter path
    val dimDir = Files.createTempDirectory("graft_rf_dim_").toString
    spark.range(0, 10)
      .select(col("id").cast("int").as("dt"),
        (col("id") % 5).as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_dim")

    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_fact f JOIN rf_dim d ON f.dt = d.dt
        |WHERE d.grp = 0""".stripMargin)
    val scans = factScans(q)
    assert(scans.nonEmpty, "expected the keyed V2 scan on the fact side")
    val scan = scans.head
    // the DPP subquery reached the scan...
    assert(scan.runtimeFilters.nonEmpty,
      s"expected a runtime filter on the fact scan:\n${q.queryExecution.executedPlan}")
    // ...and pruned execution to the dim-selected days only: dt ∈ {0, 5}
    // → 6 of 30 files (3 files x 2 days; tiny files never split)
    val parts = scan.inputRDD.getNumPartitions
    assert(parts <= 6, s"expected ≤6 pruned splits, got $parts")
    assert(parts > 0)

    // hash-identical to the unpruned plan
    val expected = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try spark.sql(
        """SELECT count(*) AS c, sum(f.v) AS s
          |FROM graft.db.rf_fact f JOIN rf_dim d ON f.dt = d.dt
          |WHERE d.grp = 0""".stripMargin).head
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    assert(q.head === expected)
  }

  test("runtime filter also prunes under a key-grouped (SPJ) claim") {
    // both sides graft, identity(dt), joined on dt → the rewrite tags
    // "kgp"; runtime filtering must still prune (filtered splits stay a
    // SUBSET of the reported partitioning — Spark's contract)
    spark.sql(
      "CREATE TABLE graft.db.rf_dim2 (dt INT, grp INT) PARTITIONED BY (dt)")
    spark.range(0, 10)
      .select(col("id").cast("int").as("dt"), (col("id") % 5).cast("int").as("grp"))
      .createOrReplaceTempView("rf_dim2_src")
    spark.sql("INSERT INTO graft.db.rf_dim2 SELECT dt, grp FROM rf_dim2_src")
    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_fact f JOIN graft.db.rf_dim2 d ON f.dt = d.dt
        |WHERE d.grp = 0""".stripMargin)
    val rows = q.head
    assert(rows.getLong(0) === 600L) // 2 of 10 days x 100 rows x 3 commits
    val scans = factScans(q)
    val fact = scans.find(_.table.name.contains("rf_fact"))
    assert(fact.nonEmpty, q.queryExecution.executedPlan.toString)
    if (fact.get.runtimeFilters.nonEmpty) {
      // under a KGP claim Spark pads the filtered groups back to the
      // original partition VALUES (outputPartitioning must stay valid),
      // so task count is not the metric — the scan's own output-row
      // metric is: only the surviving days' files were read (600 rows),
      // not the whole table (3000). The residual join/filter sits ABOVE
      // the scan, so an unpruned scan would emit all 3000.
      val rowsRead = fact.get.metrics("numOutputRows").value
      assert(rowsRead === 600L,
        s"runtime filter present but unpruned: scan emitted $rowsRead rows")
    }
  }

  test("runtime IN-sets project through BUCKET transforms") {
    // the star-join shape on a bucketed key: the dim IN-set's values
    // hash through the bucket transform, so only the surviving buckets'
    // files are read (a selective dim filter on a 16-bucket 100-TB fact
    // reads only the matching buckets)
    spark.sql(
      "CREATE TABLE graft.db.rf_bfact (k BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
    spark.sql(
      """INSERT INTO graft.db.rf_bfact
         SELECT id % 40 AS k, id AS v FROM range(0, 4000)""")
    val dimDir = Files.createTempDirectory("graft_rf_bdim_").toString
    spark.range(0, 40)
      .select(col("id").as("k"), (col("id") % 20).as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_bdim")
    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_bfact f JOIN rf_bdim d ON f.k = d.k
        |WHERE d.grp = 0""".stripMargin)
    val row = q.head
    assert(row.getLong(0) === 200L) // keys {0, 20}: 100 rows each
    val scan = factScans(q).find(_.table.name.contains("rf_bfact"))
    assert(scan.nonEmpty)
    if (scan.get.runtimeFilters.nonEmpty) {
      // 2 surviving keys land in at most 2 of 4 buckets — strictly less
      // than the full table was read
      val rowsRead = scan.get.metrics("numOutputRows").value
      assert(rowsRead < 4000L,
        s"bucket projection did not prune: scan read $rowsRead rows")
      assert(rowsRead >= 200L)
    }
  }

  test("runtime pruning composes with equality-delete MoR (upserted fact)") {
    // the two round-14 features together: a CDC-upserted fact (live
    // equality deletes in the keyed scan) joined against a filtered dim
    // must BOTH prune at runtime and apply its deletes
    spark.sql(
      "CREATE TABLE graft.db.rf_ufact (dt INT, k BIGINT, v BIGINT) " +
        "PARTITIONED BY (dt)")
    spark.sql(
      """INSERT INTO graft.db.rf_ufact
         SELECT CAST(id % 10 AS INT) AS dt, id AS k, id AS v
         FROM range(0, 1000)""")
    // keyed MERGE = equality delete + append (the upsert shape)
    spark.sql(
      """MERGE INTO graft.db.rf_ufact t
        |USING (SELECT CAST(id % 10 AS INT) AS dt, id AS k, id + 100000 AS v
        |       FROM range(0, 1000) WHERE id % 3 = 0) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_ufact f JOIN rf_dim d ON f.dt = d.dt
        |WHERE d.grp = 0""".stripMargin)
    val got = q.head
    // recompute from first principles: days {0, 5}, upserted every k%3==0
    val want = spark.range(0, 1000)
      .selectExpr("CAST(id % 10 AS INT) AS dt", "id AS k",
        "CASE WHEN id % 3 = 0 THEN id + 100000 ELSE id END AS v")
      .filter("dt IN (0, 5)")
      .agg(count(lit(1)), sum("v")).head
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(1) === want.getLong(1))
  }

  test("DataFrame-API star join gets runtime dim-side pruning too") {
    // VERDICT r14 #1: the claim decision moved to the optimizer, so a
    // DataFrame-composed star join prunes exactly like the SQL surface
    val dimDir = Files.createTempDirectory("graft_rf_dfdim_").toString
    spark.range(0, 10)
      .select(col("id").cast("int").as("dt"), (col("id") % 5).as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("grp") === 0)
    val q = spark.table("graft.db.rf_fact")
      .join(dim, Seq("dt"))
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
    val scans = factScans(q)
    assert(scans.nonEmpty, "expected the keyed V2 scan on the fact side")
    val scan = scans.head
    assert(scan.runtimeFilters.nonEmpty,
      s"expected a runtime filter on the DataFrame-API fact scan:\n" +
        q.queryExecution.executedPlan)
    val parts = scan.inputRDD.getNumPartitions
    assert(parts <= 6 && parts > 0, s"expected ≤6 pruned splits, got $parts")
    // value-exact vs the SQL surface with DPP disabled
    val expected = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try spark.sql(
        """SELECT count(*) AS c, sum(f.v) AS s
          |FROM graft.db.rf_fact f JOIN rf_dim d ON f.dt = d.dt
          |WHERE d.grp = 0""".stripMargin).head
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    assert(q.head === expected)
  }

  test("runtime pruning engages on a SORTED non-partition column (bounds)") {
    // VERDICT r14 #4: a join keyed on the table's declared SORT column
    // prunes files at runtime through the same IcebergPruning bounds
    // path — the layout clusters the column, so a dim IN-set rules
    // whole files out even though the column is not a partition source
    val table = s"$wh/db/rf_sorted"
    val df = spark.range(0, 3000).select(
      (col("id") % 3).cast("int").as("part"),
      col("id").as("k"),
      (col("id") * 2).as("v"))
    graft.iceberg.IcebergWriter.write(
      df.repartitionByRange(10, col("k")), table,
      partitionBy = Seq("part" -> "identity"), sortBy = Seq("k"))
    val dimDir = Files.createTempDirectory("graft_rf_sdim_").toString
    spark.range(0, 30)
      .select(col("id").as("k"), (col("id") / 10).cast("int").as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_sdim")

    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_sorted f JOIN rf_sdim d ON f.k = d.k
        |WHERE d.grp = 0""".stripMargin)
    val scans = factScans(q)
    assert(scans.nonEmpty,
      "a join on the sorted column must keep the keyed scan:\n" +
        q.queryExecution.executedPlan)
    val scan = scans.head
    assert(scan.runtimeFilters.nonEmpty,
      s"expected a runtime filter on the sorted column:\n" +
        q.queryExecution.executedPlan)
    // file-level pruning: the scan reads only the k-range-matching files,
    // a strict subset of the table's 3000 rows
    val rowsRead = scan.metrics("numOutputRows").value
    assert(rowsRead < 3000L, s"bounds pruning skipped nothing ($rowsRead rows)")
    assert(rowsRead >= 10L)
    // hash-exact vs the DPP-disabled plan
    val expected = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try spark.sql(
        """SELECT count(*) AS c, sum(f.v) AS s
          |FROM graft.db.rf_sorted f JOIN rf_sdim d ON f.k = d.k
          |WHERE d.grp = 0""".stripMargin).head
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    assert(q.head === expected)
  }

  test("runtime + static pruning on an UNPARTITIONED sorted table") {
    // round 15: a z-ordered/sorted UNPARTITIONED layout is common at
    // 100 TB — the keyed scan now plans it as one tuple group (splits
    // mode only; no partitioning claim is possible or made) purely for
    // its bounds pruning: static pushed filters and runtime dim IN-sets
    // both skip whole files
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val table = s"$wh/db/rf_sorted_unpart"
    val df = spark.range(0, 3000)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
    graft.iceberg.IcebergWriter.write(
      df.repartitionByRange(10, col("k")), table, sortBy = Seq("k"))
    val dimDir = Files.createTempDirectory("graft_rf_udim_").toString
    spark.range(0, 30)
      .select(col("id").as("k"), (col("id") / 10).cast("int").as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_udim")

    // static: a point filter on the sorted column plans a subset of files
    val point = spark.sql(
      "SELECT * FROM graft.db.rf_sorted_unpart WHERE k = 5")
    point.collect()
    val pScans = collect(point.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(pScans.nonEmpty, "sorted-column filter must keep the keyed scan")
    assert(pScans.head.inputRDD.getNumPartitions < 10,
      s"expected file-level pruning, got ${pScans.head.inputRDD.getNumPartitions}")

    // runtime: dim-filtered star join on the sorted column
    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_sorted_unpart f JOIN rf_udim d ON f.k = d.k
        |WHERE d.grp = 1""".stripMargin)
    val scans = factScans(q)
    assert(scans.nonEmpty)
    assert(scans.head.runtimeFilters.nonEmpty,
      q.queryExecution.executedPlan.toString)
    assert(scans.head.metrics("numOutputRows").value < 3000L)
    val expected = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try spark.sql(
        """SELECT count(*) AS c, sum(f.v) AS s
          |FROM graft.db.rf_sorted_unpart f JOIN rf_udim d ON f.k = d.k
          |WHERE d.grp = 1""".stripMargin).head
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    assert(q.head === expected)
  }

  test("runtime pruning engages on Z-ORDERED columns (snapshot summary)") {
    // a z-order rewrite records its columns in the snapshot summary
    // (Iceberg sort orders can't express z-order); the resolved table
    // exposes them like sort columns, so a dim IN-set box-prunes files
    // at runtime — ib48's static box pruning, one stage later
    val table = s"$wh/db/rf_zorder"
    val df = spark.range(0, 4000).select(
      (col("id") % 64).as("a"), (col("id") / 64).as("b"),
      col("id").as("v"))
    graft.iceberg.IcebergWriter.write(df, table)
    graft.iceberg.IcebergWriter.zorder(spark, table, Seq("a", "b"), numFiles = 16)
    val dimDir = Files.createTempDirectory("graft_rf_zdim_").toString
    spark.range(0, 64)
      .select(col("id").as("a"), (col("id") / 16).cast("int").as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_zdim")

    val q = spark.sql(
      """SELECT count(*) AS c, sum(f.v) AS s
        |FROM graft.db.rf_zorder f JOIN rf_zdim d ON f.a = d.a
        |WHERE d.grp = 0""".stripMargin)
    val scans = factScans(q)
    assert(scans.nonEmpty,
      "a join on a z-order column must keep the keyed scan:\n" +
        q.queryExecution.executedPlan)
    assert(scans.head.runtimeFilters.nonEmpty,
      q.queryExecution.executedPlan.toString)
    val rowsRead = scans.head.metrics("numOutputRows").value
    assert(rowsRead < 4000L, s"box pruning skipped nothing ($rowsRead rows)")
    val expected = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try spark.sql(
        """SELECT count(*) AS c, sum(f.v) AS s
          |FROM graft.db.rf_zorder f JOIN rf_zdim d ON f.a = d.a
          |WHERE d.grp = 0""".stripMargin).head
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    assert(q.head === expected)
  }

  test("an untranslatable runtime predicate degrades to conservative keep") {
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    // direct unit check on the bridge: unknown shapes extract nothing
    val unknown = new Predicate("STARTS_WITH",
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("dt")))
    assert(graft.sql.GraftKeyedScan.toColPredicates(unknown).isEmpty)
  }
}
