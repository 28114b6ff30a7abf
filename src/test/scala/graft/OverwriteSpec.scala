package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Dynamic partition overwrite (Iceberg's ReplacePartitions — the
  * `INSERT OVERWRITE` idiom): one snapshot atomically replaces exactly
  * the partitions the incoming data recomputed. */
class OverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-overwrite").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def day(d: String, n: Int, tag: String): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (s"$d-$i", d, tag)).toDF("id", "dt", "v")
  }

  test("daily backfill replaces only its partition; other days untouched") {
    val table = tmp("graft_ow_") + "/t"
    IcebergWriter.write(
      day("2024-01-01", 10, "old").union(day("2024-01-02", 12, "old"))
        .union(day("2024-01-03", 8, "old")).repartition(3, col("dt")),
      table, partitionBy = Seq("dt" -> "identity"))
    val beforeFiles = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data").collect().map(_.getString(0)).toSet

    // recompute day 2 with different rows
    val snap = IcebergWriter.overwritePartitions(day("2024-01-02", 5, "new"), table)
    assert(snap === 2L)

    val got = IcebergScan.scan(spark, table)
    assert(got.filter(col("dt") === "2024-01-02").count() === 5)
    assert(got.filter(col("dt") === "2024-01-02" && col("v") === "old").count() === 0)
    assert(got.filter(col("dt") =!= "2024-01-02").count() === 18)
    assert(got.filter(col("v") === "old").count() === 18)

    // untouched days still read the ORIGINAL files (no rewrite)
    val afterFiles = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data").collect().map(_.getString(0)).toSet
    val kept = beforeFiles.intersect(afterFiles)
    assert(kept.nonEmpty && kept.forall(!_.contains("dt=2024-01-02")))

    // time travel: the pre-overwrite snapshot still shows the old day
    val old = IcebergScan.scan(spark, table, Options(snapshotId = Some(1L)))
    assert(old.filter(col("dt") === "2024-01-02").count() === 12)

    // changelog of the overwrite commit: 12 deletes + 5 inserts, day 2 only
    val log = IcebergScan.changelog(spark, table, 1L)
    val byType = log.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 12L, "insert" -> 5L))
    assert(log.select("dt").distinct().collect().map(_.getString(0)).toSeq
      === Seq("2024-01-02"))
  }

  test("equivalence: overwrite == (drop replaced partitions) UNION (replacement), " +
       "across seeded random workloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val table = tmp(s"graft_owp${trial}_") + "/t"
      val nDays = 2 + rnd.nextInt(4)
      val base = (1 to 80).map { i =>
        (i.toLong, s"d${rnd.nextInt(nDays)}", rnd.nextInt(1000).toDouble)
      }.toDF("id", "dt", "v")
      IcebergWriter.write(base.repartition(3, col("dt")), table,
        partitionBy = Seq("dt" -> "identity"))
      val replacedDays = (0 until nDays).filter(_ => rnd.nextBoolean()).map(d => s"d$d")
      if (replacedDays.nonEmpty) {
        val repl = (1 to 20).map { i =>
          (1000L + i, replacedDays(rnd.nextInt(replacedDays.size)),
            rnd.nextInt(1000).toDouble)
        }.toDF("id", "dt", "v")
        IcebergWriter.overwritePartitions(repl, table)
        // only days the REPLACEMENT actually contains are replaced
        val touched = repl.select("dt").distinct().as[String].collect().toSet
        val expect = base.filter(!col("dt").isin(touched.toSeq: _*))
          .union(repl).collect().map(_.toSeq).toSet
        val got = IcebergScan.scan(spark, table).collect().map(_.toSeq).toSet
        assert(got === expect, s"trial $trial: days=$touched")
      }
    }
  }

  test("unpartitioned table: overwrite replaces everything in one snapshot") {
    val table = tmp("graft_ow2_") + "/t"
    import spark.implicits._
    IcebergWriter.write((1 to 20).map(i => (i.toLong, "old")).toDF("id", "v"), table)
    IcebergWriter.overwritePartitions(
      (1 to 3).map(i => (i.toLong, "new")).toDF("id", "v"), table)
    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 3)
    assert(got.select("v").distinct().head().getString(0) === "new")
  }

  test("null partition value does not collide with the string 'null'") {
    val table = tmp("graft_ow5_") + "/t"
    import spark.implicits._
    val init = Seq((1L, "null", "keep"), (2L, null: String, "old"), (3L, "a", "keep"))
      .toDF("id", "k", "v")
    IcebergWriter.write(init, table, partitionBy = Seq("k" -> "identity"))
    // a batch touching ONLY the null partition must not tombstone the
    // files living under the literal string partition "null"
    IcebergWriter.overwritePartitions(
      Seq((9L, null: String, "new")).toDF("id", "k", "v"), table)
    val got = IcebergScan.scan(spark, table).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got === Set(
      (1L, Some("null"), "keep"), (3L, Some("a"), "keep"), (9L, None, "new")))
  }

  test("schema drift is rejected — evolution goes through write()") {
    val table = tmp("graft_ow3_") + "/t"
    import spark.implicits._
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), table)
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.overwritePartitions(
        Seq((1L, "a", 0.5)).toDF("id", "v", "extra"), table)
    }
    assert(e.getMessage.contains("must match the table schema"))
  }

  test("live files predating the current partition spec refuse the overwrite") {
    val table = tmp("graft_ow4_") + "/t"
    import spark.implicits._
    val df = Seq((1L, "d1", "x"), (2L, "d2", "y")).toDF("id", "dt", "v")
    IcebergWriter.write(df, table) // unpartitioned era
    IcebergWriter.write(df, table, partitionBy = Seq("dt" -> "identity")) // evolve
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.overwritePartitions(
        Seq((9L, "d1", "z")).toDF("id", "dt", "v"), table)
    }
    assert(e.getMessage.contains("predates the current partition spec"))
    // after compacting to the current layout the overwrite proceeds
    IcebergWriter.compact(spark, table)
    // regression: a maintenance commit (no spec threaded) must KEEP the
    // evolved default spec — it used to redirect the default to the
    // recorded empty spec-0, silently un-partitioning the table
    assert(IcebergScan.loadInfo(spark, table)
      .defaultPartitionSpec.map(_.name) === Seq("dt"))
    IcebergWriter.overwritePartitions(
      Seq((9L, "d1", "z")).toDF("id", "dt", "v"), table)
    val got = IcebergScan.scan(spark, table)
    assert(got.filter(col("dt") === "d1").count() === 1)
    assert(got.filter(col("dt") === "d1").head().getAs[String]("v") === "z")
    assert(got.filter(col("dt") === "d2").count() === 2)
  }
}
