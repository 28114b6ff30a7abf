package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** `_metadata.file_modification_time` stability (VERDICT r15 #6): each
  * file carries its COMMITTING snapshot's timestamp (entry snapshot_id,
  * inherited from the manifest's added_snapshot_id), so an unrelated
  * append must not drift unchanged files' mtimes forward. */
class FileMtimeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("mtime is the committing snapshot's instant, stable across appends") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_mtime_").toString + "/t"
    IcebergWriter.write(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "s"), table)
    def mtimes(): Map[String, java.sql.Timestamp] =
      IcebergScan.scan(spark, table)
        .select(col("_metadata.file_path"),
          col("_metadata.file_modification_time"))
        .distinct.collect()
        .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    val first = mtimes()
    assert(first.nonEmpty)
    val snap1Ts = IcebergScan.snapshots(spark, table)
      .select("timestamp_ms").head
      .getAs[java.time.LocalDateTime](0)
    Thread.sleep(15) // commit instants are ms-resolution
    IcebergWriter.write(
      (101 to 150).map(i => (i.toLong, s"v$i")).toDF("id", "s"), table)
    val second = mtimes()
    // unchanged files keep their original commit instant exactly
    first.foreach { case (p, ts) =>
      assert(second.get(p).contains(ts),
        s"$p drifted: ${second.get(p)} != $ts")
    }
    // new files are stamped strictly later
    val newPaths = second.keySet -- first.keySet
    assert(newPaths.nonEmpty)
    val oldMax = first.values.map(_.getTime).max
    newPaths.foreach { p =>
      assert(second(p).getTime > oldMax,
        s"appended file $p must carry the newer commit instant")
    }
    // ... and the old files' stamp is the FIRST snapshot's instant
    val snap1Millis = java.sql.Timestamp.valueOf(snap1Ts).getTime
    first.values.foreach(ts => assert(math.abs(ts.getTime - snap1Millis) < 1,
      s"old-file mtime ${ts.getTime} != first commit $snap1Millis"))
  }

  test("the per-file mtime fold is lazy: a metadata-served count never " +
      "forces it; observing _metadata forces it once per relation (r18)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_mtime_wh_").toString
    val s2 = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.glazy", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.glazy.warehouse", wh)
      .getOrCreate()
    IcebergWriter.write(
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "s"), s"$wh/db/lz")
    // a COUNT the optimizer serves from metadata discards the spliced
    // scan — the O(entries) mtime map must never build
    val before = IcebergScan.mtimeFoldCount
    assert(s2.sql("SELECT count(*) AS c FROM glazy.db.lz").head.getLong(0) === 50L)
    assert(IcebergScan.mtimeFoldCount === before,
      "a metadata-served count must not force the mtime fold")
    // selecting the virtual column forces the fold — exactly once
    val withMeta = s2.sql(
      "SELECT DISTINCT _metadata.file_modification_time FROM glazy.db.lz")
    assert(withMeta.collect().nonEmpty)
    assert(IcebergScan.mtimeFoldCount >= before + 1)
  }
}
