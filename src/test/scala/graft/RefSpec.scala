package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Snapshot refs (Iceberg spec "Refs"): tags, branches, branch-isolated
  * writes, fast-forward publish (write-audit-publish), and ref-aware
  * maintenance. Engine extension — the reference predates refs. */
class RefSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-refs").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(name: String): String =
    Files.createTempDirectory("graft_ref_").toString + s"/$name"

  test("tags pin history; scan by ref name resolves them") {
    val table = freshTable("orders_tag")
    val orders = Tables.load(spark, Sf, "orders")
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val nEvens = evens.count()

    val snap1 = IcebergWriter.write(evens, table)
    IcebergWriter.createTag(spark, table, "v1")
    IcebergWriter.write(orders.filter(col("o_orderkey") % 2 === 1), table)

    // latest sees both commits, the tag still sees only the first
    assert(IcebergScan.scan(spark, table).count() === orders.count())
    val atTag = IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("v1")))
    assert(atTag.count() === nEvens)

    val refs = IcebergScan.refs(spark, table).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(refs.keys.exists(_._1 === "main"))
    assert(refs(("v1", "tag")) === snap1)

    // unknown ref errors with the available names
    val e = intercept[java.io.IOException] {
      IcebergScan.scan(spark, table, Options(snapshotFromRef = Some("nope"))).count()
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("v1"))
  }

  test("branch writes are invisible to main until fast-forward publish") {
    val table = freshTable("orders_wap")
    val orders = Tables.load(spark, Sf, "orders")
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val odds = orders.filter(col("o_orderkey") % 2 === 1)

    IcebergWriter.write(evens, table)
    IcebergWriter.createBranch(spark, table, "audit")
    IcebergWriter.write(odds, table, branch = "audit")

    // main still sees only evens; the branch sees both
    assert(IcebergScan.scan(spark, table).count() === evens.count())
    assert(IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("audit"))).count() === orders.count())

    // publish: main fast-forwards to the audited branch head
    IcebergWriter.fastForward(spark, table, "audit")
    assert(IcebergScan.scan(spark, table).count() === orders.count())

    // row-identical to a plain two-append table
    val got = IcebergScan.scan(spark, table)
    val want = orders.select(got.columns.map(col): _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("fast-forward refuses diverged branches") {
    val table = freshTable("orders_div")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    IcebergWriter.write(orders, table)
    IcebergWriter.createBranch(spark, table, "side")
    IcebergWriter.write(orders.limit(10), table, branch = "side")
    IcebergWriter.write(orders.limit(20), table) // main advances too
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, table, "side")
    }
    assert(e.getMessage.contains("diverged"))
  }

  test("writing to a missing branch or a tag is rejected") {
    val table = freshTable("orders_guard")
    val orders = Tables.load(spark, Sf, "orders").limit(50)
    IcebergWriter.write(orders, table)
    val e1 = intercept[IllegalArgumentException] {
      IcebergWriter.write(orders, table, branch = "ghost")
    }
    assert(e1.getMessage.contains("createBranch"))
    IcebergWriter.createTag(spark, table, "pin")
    val e2 = intercept[IllegalArgumentException] {
      IcebergWriter.write(orders, table, branch = "pin")
    }
    assert(e2.getMessage.contains("tag"))
    // the refusal fired pre-flight: no orphaned data dir blocks the next
    // commit's snapshot id
    IcebergWriter.write(orders, table)
    assert(IcebergScan.scan(spark, table).count() === 100)
    // duplicate ref names rejected
    val e3 = intercept[IllegalArgumentException] {
      IcebergWriter.createTag(spark, table, "pin")
    }
    assert(e3.getMessage.contains("already exists"))
  }

  test("expiration never drops ref heads; dropRef releases them") {
    val table = freshTable("orders_exp")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    val snap1 = IcebergWriter.write(orders.limit(10), table)
    IcebergWriter.createTag(spark, table, "keepme")
    (2 to 4).foreach(i => IcebergWriter.write(orders.limit(10 * i), table))

    // keep=1 would normally leave only the newest snapshot — the tag
    // head must survive anyway
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    val ids = IcebergScan.snapshots(spark, table).collect().map(_.getLong(1)).toSet
    assert(ids.contains(snap1))
    assert(IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("keepme"))).count() === 10)

    // after dropRef the pinned snapshot becomes expirable
    IcebergWriter.dropRef(spark, table, "keepme")
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    val ids2 = IcebergScan.snapshots(spark, table).collect().map(_.getLong(1)).toSet
    assert(!ids2.contains(snap1))
    intercept[IllegalArgumentException] {
      IcebergWriter.dropRef(spark, table, "main")
    }
  }

  test("rollback moves main below a newer tag without dropping it") {
    val table = freshTable("orders_rb")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    val snap1 = IcebergWriter.write(orders.limit(10), table)
    val snap2 = IcebergWriter.write(orders.limit(20), table)
    IcebergWriter.createTag(spark, table, "late", at = Some(snap2))
    IcebergWriter.rollback(spark, table, snap1)

    // plain scan lands on the rollback target even though the tag's
    // snapshot is newer by timestamp; the tag still sees both appends
    assert(IcebergScan.scan(spark, table).count() === 10)
    assert(IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("late"))).count() === 30)
  }

  test("row-level ops target a branch: staged MoR delete + merge publish atomically") {
    val table = freshTable("orders_rowops")
    val orders = Tables.load(spark, Sf, "orders")
      .orderBy("o_orderkey").limit(100).cache()
    // o_orderkey is unique: the 10th/90th smallest keys give exact cuts
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val (delCut, hiCut) = (keys(9), keys(89))
    IcebergWriter.write(orders, table)
    IcebergWriter.createBranch(spark, table, "stage")

    // stage a MoR delete and an upsert on the branch
    IcebergWriter.delete(spark, table, col("o_orderkey") <= delCut, branch = "stage")
    val upserts = orders.filter(col("o_orderkey") > hiCut)
      .withColumn("o_orderpriority", lit("patched"))
    IcebergWriter.merge(spark, table, upserts, Seq("o_orderkey"), branch = "stage")

    // main is untouched; the branch reflects both staged ops
    assert(IcebergScan.scan(spark, table).count() === 100)
    val staged = IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("stage")))
    assert(staged.count() === 90)
    assert(staged.filter(col("o_orderpriority") === "patched").count() === 10)

    IcebergWriter.fastForward(spark, table, "stage")
    val main = IcebergScan.scan(spark, table)
    assert(main.count() === 90 &&
      main.filter(col("o_orderkey") <= delCut).isEmpty)

    // a tag is immutable — row-level ops reject it
    IcebergWriter.createTag(spark, table, "pin")
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.delete(spark, table, lit(true), branch = "pin")
    }
    assert(e.getMessage.contains("tag"))
    orders.unpersist()
  }

  test("per-commit changelog follows main's lineage, skipping branch commits") {
    val table = freshTable("orders_cdc")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    val snap1 = IcebergWriter.write(orders.limit(10), table)
    IcebergWriter.createBranch(spark, table, "side")
    IcebergWriter.write(orders.limit(30), table, branch = "side") // concurrent commit
    val snap3 = IcebergWriter.write(
      orders.filter(col("o_orderkey") > 10).limit(20), table)     // main commit

    val byCommit = IcebergScan.changelogBySnapshot(spark, table, snap1)
      .groupBy("_commit_snapshot_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // only the MAIN commit appears; the side-branch commit is not part
    // of main's ancestry and must not be attributed
    assert(byCommit === Map(snap3 -> 20L))
  }

  test("refs surface through SQL: scan named arg + iceberg_refs listing") {
    val table = freshTable("orders_sql")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders.filter(col("o_orderkey") % 2 === 0), table)
    IcebergWriter.createTag(spark, table, "v1")
    IcebergWriter.write(orders.filter(col("o_orderkey") % 2 === 1), table)
    graft.sql.GraftSql.register(spark)

    val n = spark.sql(
      s"SELECT count(*) AS c FROM iceberg_scan('$table', snapshot_from_ref => 'v1')")
      .collect()(0).getLong(0)
    assert(n === orders.filter(col("o_orderkey") % 2 === 0).count())
    // positional ref name is equivalent (extension over the reference's
    // id|timestamp dispatch)
    val n2 = spark.sql(s"SELECT count(*) AS c FROM iceberg_scan('$table', 'v1')")
      .collect()(0).getLong(0)
    assert(n2 === n)

    val listed = spark.sql(s"SELECT * FROM iceberg_refs('$table')").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(listed === Set(("main", "branch"), ("v1", "tag")))
  }

  test("review fixes: ff guards, staged-lineage expire, main-only travel") {
    val table = freshTable("orders_guards")
    val orders = Tables.load(spark, Sf, "orders").limit(100).cache()
    IcebergWriter.write(orders.limit(10), table)

    // fastForward cannot move a tag or silently create a missing branch
    IcebergWriter.createTag(spark, table, "pin")
    IcebergWriter.createBranch(spark, table, "audit")
    IcebergWriter.write(orders.limit(20), table, branch = "audit")
    val e1 = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, table, "audit", branch = "pin")
    }
    assert(e1.getMessage.contains("tag"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, table, "audit", branch = "ghost")
    }
    assert(e2.getMessage.contains("createBranch"))

    // timestamp "as of now" resolves on MAIN's lineage even though the
    // staged commit carries the newest timestamp
    val asOfNow = IcebergScan.scan(spark, table,
      Options(asOfTimestampMs = Some(System.currentTimeMillis() + 60000)))
    assert(asOfNow.count() === 10)

    // rollback refuses a staged branch commit as its target
    val stagedHead = IcebergScan.refs(spark, table).collect()
      .find(_.getString(0) == "audit").get.getLong(2)
    val e3 = intercept[IllegalArgumentException] {
      IcebergWriter.rollback(spark, table, stagedHead)
    }
    assert(e3.getMessage.contains("ancestor"))
    orders.unpersist()
  }

  test("expire keeps a branch publishable: staged intermediates survive") {
    val table = freshTable("orders_stageexp")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    IcebergWriter.write(orders.limit(10), table)
    IcebergWriter.createBranch(spark, table, "audit")
    IcebergWriter.write(orders.limit(10), table, branch = "audit")
    IcebergWriter.write(orders.limit(10), table, branch = "audit")

    // keep=1 would drop the intermediate staged commit without lineage
    // protection, deadending fastForward's ancestry walk
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    IcebergWriter.fastForward(spark, table, "audit")
    assert(IcebergScan.scan(spark, table).count() === 30)
  }

  test("branch commits cannot change the shared table schema") {
    val table = freshTable("orders_schema")
    val orders = Tables.load(spark, Sf, "orders").limit(50)
    IcebergWriter.write(orders, table)
    IcebergWriter.createBranch(spark, table, "audit")
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.write(orders.withColumn("note", lit("x")), table,
        branch = "audit")
    }
    assert(e.getMessage.contains("main-only"))
    // the same evolution on main is fine
    IcebergWriter.write(orders.withColumn("note", lit("x")), table)
    assert(IcebergScan.scan(spark, table).columns.contains("note"))
  }

  test("a branch commit never regresses the current schema; tags pin theirs") {
    val table = freshTable("orders_schemahist")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.createBranch(spark, table, "stage")
    IcebergWriter.createTag(spark, table, "pre")
    // main evolves; the branch then receives a staged delete based on the
    // OLD schema — current-schema-id must stay at the evolved schema
    IcebergWriter.write(nation.withColumn("extra", lit(1L)), table)
    IcebergWriter.delete(spark, table, col("n_nationkey") < 0, branch = "stage")
    assert(IcebergScan.scan(spark, table).columns.contains("extra"))
    // the tag still reads its pinned (pre-evolution) schema
    assert(!IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("pre"))).columns.contains("extra"))
    // the branch (like latest) reads the current schema
    assert(IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("stage"))).columns.contains("extra"))
  }

  test("model-based WAP fuzz: 40 seeded ops preserve every scan invariant") {
    import scala.util.Random
    val table = freshTable("orders_fuzz")
    val rnd = new Random(42)
    var nextVal = 0L
    def batch(n: Int) = {
      import spark.implicits._
      val vals = (nextVal until nextVal + n)
      nextVal += n
      vals.toDF("v")
    }
    // model state: row counts per surface
    var mainCount = 0L
    var branchCount: Option[Long] = None  // at most one staged branch
    var tags = Map.empty[String, Long]
    var tagId = 0

    IcebergWriter.write(batch(5), table); mainCount = 5

    def check(): Unit = {
      assert(IcebergScan.scan(spark, table).count() === mainCount)
      branchCount.foreach { c =>
        assert(IcebergScan.scan(spark, table,
          Options(snapshotFromRef = Some("wip"))).count() === c)
      }
      tags.foreach { case (name, c) =>
        assert(IcebergScan.scan(spark, table,
          Options(snapshotFromRef = Some(name))).count() === c)
      }
    }

    for (_ <- 1 to 40) {
      rnd.nextInt(6) match {
        case 0 => // main append
          val n = 1 + rnd.nextInt(4)
          IcebergWriter.write(batch(n), table)
          mainCount += n
          // a staged branch survives main advancing; it just becomes
          // unpublishable (the publish op below asserts the refusal)
        case 1 => // stage a branch (if none)
          if (branchCount.isEmpty) {
            IcebergWriter.createBranch(spark, table, "wip")
            branchCount = Some(mainCount)
          }
        case 2 => // branch append
          branchCount = branchCount.map { c =>
            val n = 1 + rnd.nextInt(4)
            IcebergWriter.write(batch(n), table, branch = "wip")
            c + n
          }
        case 3 => // publish if the branch is still fast-forwardable
          branchCount.foreach { c =>
            try {
              IcebergWriter.fastForward(spark, table, "wip")
              mainCount = c
            } catch {
              case e: IllegalArgumentException =>
                assert(e.getMessage.contains("diverged"))
            }
            IcebergWriter.dropRef(spark, table, "wip")
            branchCount = None
          }
        case 4 => // tag the current main head
          tagId += 1
          val name = s"t$tagId"
          IcebergWriter.createTag(spark, table, name)
          tags += name -> mainCount
        case 5 => // expire aggressively — must not break any surface
          IcebergWriter.expireSnapshots(spark, table, keep = 1)
      }
      check()
    }
    // drop tags one by one; remaining surfaces stay intact
    tags.keys.toSeq.sorted.foreach { name =>
      IcebergWriter.dropRef(spark, table, name)
      tags -= name
      check()
    }
  }

  test("ref retention: fields round-trip and survive unrelated ref commits") {
    val table = freshTable("nation_ret")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.createTag(spark, table, "audit")
    IcebergWriter.setRefRetention(spark, table, "audit",
      maxRefAgeMs = Some(86400000L))
    IcebergWriter.setRefRetention(spark, table, "main",
      maxSnapshotAgeMs = Some(3600000L), minSnapshotsToKeep = Some(2))
    def ret = IcebergScan.loadInfo(spark, table).refRetention
    assert(ret("audit").maxRefAgeMs === Some(86400000L))
    assert(ret("main").minSnapshotsToKeep === Some(2))
    // an unrelated ref commit must carry the policies forward
    IcebergWriter.createTag(spark, table, "other")
    assert(ret("audit").maxRefAgeMs === Some(86400000L))
    assert(ret("main").maxSnapshotAgeMs === Some(3600000L))
    // clearing removes the fields
    IcebergWriter.setRefRetention(spark, table, "audit")
    assert(!ret.contains("audit"))
  }

  test("expire honors max-ref-age-ms: lapsed tags drop, their history frees") {
    val table = freshTable("nation_refage")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation.limit(5), table)  // snap 1
    IcebergWriter.createTag(spark, table, "old") // pins snap 1
    IcebergWriter.write(nation.limit(3), table)  // snap 2
    IcebergWriter.write(nation.limit(1), table)  // snap 3
    val now = System.currentTimeMillis() + 10000
    // age 0: the tag has lapsed → dropped, snapshot 1 expirable in-sweep
    IcebergWriter.setRefRetention(spark, table, "old", maxRefAgeMs = Some(0L))
    val dropped = IcebergWriter.expireSnapshotsOlderThan(
      spark, table, olderThanMs = now, nowMs = now)
    val info = IcebergScan.loadInfo(spark, table)
    assert(!info.refs.contains("old"))
    assert(dropped === 2) // snaps 1 and 2; 3 survives as newest
    assert(IcebergScan.scan(spark, table).count() === 9L) // appends: 5+3+1
    // a generous age would have kept the tag (fresh table)
    val t2 = freshTable("nation_refage2")
    IcebergWriter.write(nation.limit(5), t2)
    IcebergWriter.createTag(spark, t2, "young")
    IcebergWriter.setRefRetention(spark, t2, "young",
      maxRefAgeMs = Some(7L * 86400000L))
    IcebergWriter.write(nation.limit(3), t2)
    IcebergWriter.expireSnapshotsOlderThan(
      spark, t2, olderThanMs = System.currentTimeMillis() + 10000)
    assert(IcebergScan.loadInfo(spark, t2).refs.contains("young"))
    // the pinned snapshot stayed readable through the tag
    assert(IcebergScan.scan(spark, t2,
      Options(snapshotFromRef = Some("young"))).count() === 5L)
  }

  test("expire honors branch min-snapshots-to-keep and max-snapshot-age-ms") {
    val table = freshTable("nation_minkeep")
    val nation = Tables.load(spark, Sf, "nation")
    (1 to 5).foreach(i => IcebergWriter.write(nation.limit(i), table))
    IcebergWriter.setRefRetention(spark, table, "main",
      minSnapshotsToKeep = Some(3))
    val now = System.currentTimeMillis() + 10000
    val dropped = IcebergWriter.expireSnapshotsOlderThan(
      spark, table, olderThanMs = now, nowMs = now)
    // expire-everything cutoff, but main keeps its newest 3 ancestors
    assert(dropped === 2)
    val ids = IcebergScan.snapshots(spark, table)
      .select("snapshot_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L, 4L, 5L))
    // age-based protection: everything younger than 7 days survives an
    // expire-everything sweep
    val t2 = freshTable("nation_age")
    (1 to 3).foreach(i => IcebergWriter.write(nation.limit(i), t2))
    IcebergWriter.setRefRetention(spark, t2, "main",
      maxSnapshotAgeMs = Some(7L * 86400000L))
    val now2 = System.currentTimeMillis() + 10000
    assert(IcebergWriter.expireSnapshotsOlderThan(
      spark, t2, olderThanMs = now2, nowMs = now2) === 0)
  }

  test("cherrypickSnapshot publishes ONE staged append, leaving the rest staged") {
    val table = freshTable("cherry")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation.filter(col("n_nationkey") < 10), table) // snap 1 (main)
    IcebergWriter.createBranch(spark, table, "staging")
    val picked = IcebergWriter.write(
      nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15),
      table, branch = "staging") // snap 2 (staged)
    IcebergWriter.write(
      nation.filter(col("n_nationkey") >= 15), table, branch = "staging") // snap 3

    assert(IcebergScan.scan(spark, table).count() === 10) // main untouched
    val newMain = IcebergWriter.cherrypickSnapshot(spark, table, picked)

    // main gained ONLY the picked commit's rows; snap 3 stays staged
    val main = IcebergScan.scan(spark, table)
    assert(main.count() === 15)
    assert(main.filter(col("n_nationkey") >= 15).count() === 0)
    // the staging branch is untouched and still fully readable
    assert(IcebergScan.scan(spark, table,
      Options(snapshotFromRef = Some("staging"))).count() === nation.count())
    // provenance recorded in the summary
    assert(IcebergWriter.maxSummaryValue(spark, table, "source-snapshot-id")
      .contains(picked))
    assert(newMain > picked)

    // duplicate-publish guards: the SAME staged snapshot cannot be
    // picked twice (provenance check), and a snapshot already on main's
    // lineage cannot be picked at all — either would re-add its data
    // files and silently duplicate rows
    val dup = intercept[IllegalArgumentException] {
      IcebergWriter.cherrypickSnapshot(spark, table, picked)
    }
    assert(dup.getMessage.contains("already cherry-picked"), dup.getMessage)
    val onMain = intercept[IllegalArgumentException] {
      IcebergWriter.cherrypickSnapshot(spark, table, newMain)
    }
    assert(onMain.getMessage.contains("already reachable"), onMain.getMessage)

    // a DELETE commit on the branch refuses to cherry-pick
    IcebergWriter.delete(spark, table, col("n_nationkey") === 1,
      branch = "staging")
    val delSnap = IcebergScan.loadInfo(spark, table)
      .refs("staging")._1
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.cherrypickSnapshot(spark, table, delSnap)
    }
    assert(e.getMessage.contains("APPEND"), e.getMessage)

    // SQL procedure surface
    graft.sql.GraftSql.register(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM iceberg_ancestors_of('$table')").collect()
    assert(viaSql.head.getLong(0) === newMain)
  }
}
