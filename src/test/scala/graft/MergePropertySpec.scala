package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergWriter
import graft.iceberg.IcebergWriter.MergeClause

import scala.util.Random

/** Property harness for the general MERGE ([[IcebergWriter.mergeInto]]):
  * random targets, sources and clause stacks run through the engine and
  * through a PLAIN-SCALA reference model of the standard's semantics
  * (first passing clause wins per row category); the committed table
  * must equal the model exactly. Catches clause-ordering, NULL-handling
  * and category-routing bugs no example test enumerates. */
class MergePropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-merge-prop").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private case class T(id: Long, v: Long)
  private case class S(id: Long, s: Option[Long])

  /** One clause template: engine closure + reference model. `cond`
    * None = unconditional; model conditions treat None (NULL) input as
    * not-matching, like SQL. */
  private case class Tpl(
      name: String,
      engine: MergeClause,
      // (targetRow, sourceRow) => condition result; None input = absent side
      cond: (Option[T], Option[S]) => Boolean,
      // None = DELETE; Some(f) = the new row
      apply: Option[(Option[T], Option[S]) => T])

  private def matchedTpls: Seq[Tpl] = Seq(
    Tpl("upd_small",
      MergeClause(Some((t, s) => s("s") < 50),
        Some(Map("v" -> ((t, s) => s("s") * 10)))),
      (_, s) => s.exists(_.s.exists(_ < 50)),
      Some((t, s) => T(t.get.id, s.get.s.get * 10))),
    Tpl("upd_all",
      MergeClause(None, Some(Map("v" -> ((t, s) => s("s") + 1000)))),
      (_, _) => true,
      Some((t, s) => T(t.get.id, s.get.s.get + 1000))),
    Tpl("del_big",
      MergeClause(Some((t, s) => s("s") >= 70), None),
      (_, s) => s.exists(_.s.exists(_ >= 70)),
      None),
    Tpl("del_all", MergeClause(None, None), (_, _) => true, None))

  private def notMatchedTpls: Seq[Tpl] = Seq(
    Tpl("ins_all",
      MergeClause(None,
        Some(Map("id" -> ((t, s) => s("id")), "v" -> ((t, s) => s("s"))))),
      (_, _) => true,
      Some((_, s) => T(s.get.id, s.get.s.get))),
    Tpl("ins_small",
      MergeClause(Some((t, s) => s("s") < 40),
        Some(Map("id" -> ((t, s) => s("id")), "v" -> ((t, s) => s("s") * 2)))),
      (_, s) => s.exists(_.s.exists(_ < 40)),
      Some((_, s) => T(s.get.id, s.get.s.get * 2))))

  private def bySourceTpls: Seq[Tpl] = Seq(
    Tpl("bs_del_odd",
      MergeClause(Some((t, _) => t("id") % 2 === 1), None),
      (t, _) => t.exists(_.id % 2 == 1),
      None),
    Tpl("bs_zero",
      MergeClause(Some((t, _) => t("v") > 55), Some(Map("v" -> ((t, _) => lit(0L))))),
      (t, _) => t.exists(_.v > 55),
      Some((t, _) => T(t.get.id, 0L))))

  /** The reference model: standard MERGE semantics over plain rows. A
    * source row with NULL s makes <,>= conditions null → clause skipped
    * (handled by the Option model functions). */
  private def model(target: Seq[T], source: Seq[S],
      m: Seq[Tpl], nm: Seq[Tpl], bs: Seq[Tpl]): Set[T] = {
    val srcById = source.map(r => r.id -> r).toMap
    val tgtIds = target.map(_.id).toSet
    val out = Seq.newBuilder[T]
    target.foreach { t =>
      srcById.get(t.id) match {
        case Some(s) => // matched: first passing clause
          m.find(_.cond(Some(t), Some(s))) match {
            case Some(tpl) => tpl.apply.foreach(f => out += f(Some(t), Some(s)))
            case None => out += t // matched, no clause applied → keep
          }
        case None => // not matched by source
          bs.find(_.cond(Some(t), None)) match {
            case Some(tpl) => tpl.apply.foreach(f => out += f(Some(t), None))
            case None => out += t
          }
      }
    }
    source.filterNot(s => tgtIds(s.id)).foreach { s =>
      nm.find(_.cond(None, Some(s))).foreach { tpl =>
        // INSERT with a NULL source value inserts v = null — the engine
        // and model both exclude that by generation (s defined when a
        // conditional clause passed; unconditional insert of null v is
        // generated rarely and compared as -1 sentinel); keep simple:
        // apply only when s.s is defined
        if (s.s.isDefined) tpl.apply.foreach(f => out += f(None, Some(s)))
      }
    }
    out.result().toSet
  }

  test("random clause stacks match the reference model (25 trials)") {
    val rnd = new Random(42)
    (1 to 25).foreach { trial =>
      val n = 6 + rnd.nextInt(10)
      val target = (0L until n).map(i => T(i, rnd.nextInt(100).toLong))
      // unique source keys (cardinality violations tested separately):
      // mix of existing and new ids; ~1 in 8 carries a NULL value
      val srcIds = rnd.shuffle((0 until (n + 6)).map(_.toLong).toVector)
        .take(4 + rnd.nextInt(8))
      val source = srcIds.map(id => S(id,
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(100).toLong)))

      def pick(tpls: Seq[Tpl], max: Int): Seq[Tpl] =
        rnd.shuffle(tpls).take(rnd.nextInt(max + 1))
      var m = pick(matchedTpls, 2)
      var nm = pick(notMatchedTpls, 1)
      var bs = pick(bySourceTpls, 1)
      if (m.isEmpty && nm.isEmpty && bs.isEmpty) m = Seq(matchedTpls.head)
      // NULL-valued source rows make the unconditional INSERT/UPDATE
      // write null v (engine-correct, but the model keeps plain longs) —
      // restrict to conditional templates when nulls are present
      if (source.exists(_.s.isEmpty)) {
        nm = nm.filter(_.name != "ins_all")
        m = m.filter(_.name != "upd_all")
        if (m.isEmpty && nm.isEmpty && bs.isEmpty) m = Seq(matchedTpls.head)
      }

      import spark.implicits._
      val table = java.nio.file.Files
        .createTempDirectory(s"graft_mprop_$trial").toString + "/t"
      IcebergWriter.write(
        target.map(t => (t.id, t.v)).toDF("id", "v"), table)
      val src = source.map(s => (s.id, s.s)).toDF("id", "s")

      IcebergWriter.mergeInto(spark, table, src,
        on = (t, s) => t("id") === s("id"),
        matched = m.map(_.engine),
        notMatched = nm.map(_.engine),
        notMatchedBySource = bs.map(_.engine))

      val got = graft.iceberg.IcebergScan.scan(spark, table)
        .collect().map(r => T(r.getLong(0), r.getLong(1))).toSet
      val want = model(target, source, m, nm, bs)
      assert(got === want,
        s"trial $trial: clauses m=${m.map(_.name)} nm=${nm.map(_.name)} " +
          s"bs=${bs.map(_.name)}\n target=$target\n source=$source")
    }
  }
}
