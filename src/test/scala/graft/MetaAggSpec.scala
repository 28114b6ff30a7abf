package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.iceberg.{IcebergModel, MetaAgg, TupleAgg}

/** Unit pins for the per-tuple stat partials (round 17): the fold/merge
  * must preserve the driver-side rules EXACTLY — an all-null entry skips
  * MIN/MAX without poisoning, a contributing entry without a decodable
  * bound poisons, absent null counts poison the non-null total, zero-row
  * entries never mint partials, and merging is associative over the
  * three-valued bound state. */
class MetaAggSpec extends AnyFunSuite {

  private val Id = 7
  private val needed = Seq(Id -> LongType)

  private def le8(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.array()
  }

  private def entry(rows: Long, nullCount: Option[Long],
                    lo: Option[Long], hi: Option[Long],
                    part: Map[String, Any] = Map("dt" -> Int.box(1))) =
    IcebergModel.ManifestEntry(
      status = 1, content = 0, filePath = s"f${util.Random.nextInt()}",
      fileFormat = "PARQUET", recordCount = rows, fileSizeInBytes = 1L,
      partition = part,
      nullCounts = nullCount.map(Id -> _).toMap,
      lowerBounds = lo.map(v => Id -> le8(v)).toMap,
      upperBounds = hi.map(v => Id -> le8(v)).toMap)

  test("fold drops zero-row entries and merges per partition tuple") {
    val ts = MetaAgg.fold(Iterator(
      entry(10, Some(0), Some(5), Some(9)),
      entry(0, Some(0), Some(1), Some(2)), // zero-row: no partial
      entry(20, Some(2), Some(3), Some(7)),
      entry(5, Some(0), Some(100), Some(200), Map("dt" -> Int.box(2)))),
      needed)
    assert(ts.size === 2)
    val t1 = ts.find(_.partition("dt") == Int.box(1)).get
    assert(t1.rows === 30L)
    assert(t1.nonNull(Id) === 28L)
    assert(t1.lo(Id) === 3L)
    assert(t1.hi(Id) === 9L)
    assert(!t1.allNull(Id) && !t1.poisoned(Id))
  }

  test("all-null entries skip MIN/MAX without poisoning; fully-null tuples mark allNull") {
    // sparse column: one all-null file + one real file
    val sparse = MetaAgg.fold(Iterator(
      entry(10, Some(10), None, None), // provably all-null: no bound needed
      entry(4, Some(0), Some(42), Some(50))), needed).head
    assert(!sparse.poisoned(Id) && !sparse.allNull(Id))
    assert(sparse.lo(Id) === 42L)
    assert(sparse.nonNull(Id) === 4L)
    // entirely-null tuple
    val allN = MetaAgg.fold(Iterator(
      entry(10, Some(10), None, None),
      entry(3, Some(3), None, None)), needed).head
    assert(allN.allNull(Id) && !allN.poisoned(Id))
    assert(allN.nonNull(Id) === 0L)
  }

  test("a contributing entry without a decodable bound poisons; absent null count poisons the total") {
    val poisoned = MetaAgg.fold(Iterator(
      entry(10, Some(0), None, None), // contributing, no bounds recorded
      entry(4, Some(0), Some(1), Some(2))), needed).head
    assert(poisoned.poisoned(Id))
    // absent null count: bounds still fine, non-null total absent
    val noNc = MetaAgg.fold(Iterator(
      entry(10, None, Some(1), Some(9))), needed).head
    assert(!noNc.nonNull.contains(Id))
    assert(!noNc.poisoned(Id) && noNc.hi(Id) === 9L)
  }

  test("merge propagates poison over allNull and keeps exact sums") {
    def t(rows: Long, nn: Option[Long], lo: Option[Long], hi: Option[Long],
          all: Boolean, poi: Boolean) =
      TupleAgg(Map("dt" -> Int.box(1)), rows,
        nn.map(Id -> _).toMap,
        lo.map(v => Id -> (v: Any)).toMap, hi.map(v => Id -> (v: Any)).toMap,
        if (all) Set(Id) else Set.empty, if (poi) Set(Id) else Set.empty)
    val a = t(10, Some(8), Some(3L), Some(7L), all = false, poi = false)
    val b = t(5, Some(5), None, None, all = true, poi = false)
    val c = t(2, None, None, None, all = false, poi = true)
    val ab = MetaAgg.merge(a, b, needed)
    assert(ab.rows === 15L && ab.nonNull(Id) === 13L)
    assert(!ab.allNull(Id) && !ab.poisoned(Id))
    assert(ab.lo(Id) === 3L)
    val abc = MetaAgg.merge(ab, c, needed)
    assert(abc.poisoned(Id), "poison must survive any merge order")
    assert(!abc.nonNull.contains(Id), "absent total poisons the sum")
    val bb = MetaAgg.merge(b, b, needed)
    assert(bb.allNull(Id) && bb.nonNull(Id) === 10L)
  }

  test("decode is exact for int (4-byte) and long (8-byte) domains") {
    val b4 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b4.putInt(-123); val intBytes = b4.array()
    assert(MetaAgg.decodeCat(IntegerType, intBytes) === Some(-123))
    assert(MetaAgg.decodeCat(LongType, intBytes) === None,
      "a long decode must not read past a 4-byte bound")
    assert(MetaAgg.decodeCat(LongType, le8(Long.MinValue)) ===
      Some(Long.MinValue))
  }

  test("strings fold MIN-ONLY: sub-limit lower bounds serve, 16-code-point " +
      "bounds refuse (possible truncation), upper bounds never serve") {
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val sid = 9
    val sneeded = Seq(sid -> (StringType: org.apache.spark.sql.types.DataType))
    def sentry(lo: Option[String], hi: Option[String]) =
      IcebergModel.ManifestEntry(
        status = 1, content = 0, filePath = s"s${util.Random.nextInt()}",
        fileFormat = "PARQUET", recordCount = 5, fileSizeInBytes = 1L,
        partition = Map("dt" -> Int.box(1)),
        nullCounts = Map(sid -> 0L),
        lowerBounds = lo.map(v => sid -> v.getBytes("UTF-8")).toMap,
        upperBounds = hi.map(v => sid -> v.getBytes("UTF-8")).toMap)
    // short bounds: lo serves, hi is NOT recorded in the partial
    val ok = MetaAgg.fold(Iterator(
      sentry(Some("apple"), Some("pear")),
      sentry(Some("ant"), Some("zebra"))), sneeded).head
    assert(!ok.poisoned(sid))
    assert(ok.lo(sid) === UTF8String.fromString("ant"))
    assert(!ok.hi.contains(sid), "string max must never serve")
    // a 16-code-point lower bound is ambiguous (may be truncated): poison
    val long16 = "abcdefghijklmnop" // exactly 16 cp
    assert(long16.codePointCount(0, long16.length) === 16)
    val amb = MetaAgg.fold(Iterator(
      sentry(Some(long16), Some("z")),
      sentry(Some("ant"), Some("z"))), sneeded).head
    assert(amb.poisoned(sid))
    // 15 code points is provably whole
    assert(MetaAgg.decodeCat(StringType, "abcdefghijklmno".getBytes("UTF-8"))
      .contains(UTF8String.fromString("abcdefghijklmno")))
    // UTF-8 BYTE order, not UTF-16 code-unit order: U+10000 (surrogate
    // pair in UTF-16, sorts LOW there) must sort ABOVE U+FFFD
    val supplementary = new String(Character.toChars(0x10000))
    val mix = MetaAgg.fold(Iterator(
      sentry(Some(supplementary), Some("z")),
      sentry(Some("�"), Some("z"))), sneeded).head
    assert(mix.lo(sid) === UTF8String.fromString("�"))
  }

  test("applyDeletes: counts subtract per file, provable non-null losses " +
      "stay exact, fully-deleted tuples mint no group, corrupt refuses") {
    import MetaAgg.DeletedFile
    def part(p: Int) = Map[String, Any]("dt" -> Int.box(p))
    def t(p: Int, rows: Long, lo: Long = 3L, hi: Long = 9L) =
      TupleAgg(part(p), rows, Map(Id -> rows),
        Map(Id -> (lo: Any)), Map(Id -> (hi: Any)), Set.empty, Set.empty)
    def del(p: Int, rows: Long, d: Long, lo: Long = 3L, hi: Long = 9L) =
      DeletedFile(t(p, rows, lo, hi), d)
    val base = Seq(t(1, 10), t(3, 7))
    val out = MetaAgg.applyDeletes(base,
      Seq(del(1, 8, 4), del(2, 5, 5)), needed).get
    // tuple 2's only file fully deleted: mints no group; 3 untouched
    assert(out.map(x => x.partition("dt") -> x.rows).toMap ===
      Map(Int.box(1) -> 14L, Int.box(3) -> 7L))
    val adj = out.find(_.partition("dt") == Int.box(1)).get
    // provable zero-null loss: count(col) stays exact
    assert(adj.nonNull(Id) === 14L && !adj.poisoned(Id))
    val keep = out.find(_.partition("dt") == Int.box(3)).get
    assert(!keep.poisoned(Id) && keep.nonNull(Id) === 7L && keep.lo(Id) === 3L)
    // a MIXED-null deleted file drops the column's total instead of
    // guessing (its loss is unknowable from counts)
    val mixed = TupleAgg(part(4), 10, Map(Id -> 6L),
      Map(Id -> (3L: Any)), Map(Id -> (9L: Any)), Set.empty, Set.empty)
    val unk = MetaAgg.applyDeletes(Seq(t(4, 10)),
      Seq(DeletedFile(mixed, 2L)), needed).get.head
    assert(unk.rows === 18L && !unk.nonNull.contains(Id))
    // all-null columns keep their exact zero under deletion
    val an = TupleAgg(part(9), 4, Map(Id -> 0L),
      Map.empty, Map.empty, Set(Id), Set.empty)
    val outAn = MetaAgg.applyDeletes(Seq.empty,
      Seq(DeletedFile(an, 1L)), needed).get
    assert(outAn.head.allNull(Id) && outAn.head.nonNull(Id) === 0L &&
      !outAn.head.poisoned(Id))
    // deletions exceeding a FILE's rows = corrupt foreign metadata
    assert(MetaAgg.applyDeletes(base, Seq(del(3, 7, 8)), needed).isEmpty)
    // a FULLY-deleted file keeps zero live values even when its null
    // counts were never recorded (foreign v1-ish stats) — the column's
    // total must not refuse on its account
    val noNc = TupleAgg(part(8), 5, Map.empty,
      Map.empty, Map.empty, Set.empty, Set(Id))
    val outNc = MetaAgg.applyDeletes(Seq(t(8, 10)),
      Seq(DeletedFile(noNc, 5L)), needed).get.head
    assert(outNc.rows === 10L && outNc.nonNull(Id) === 10L)
    assert(outNc.lo(Id) === 3L, "a fully-deleted file constrains no bound")
  }

  test("applyDeletes bounds: un-deleted side serves when it DOMINATES " +
      "every live deleted file's bound; dominated sides refuse") {
    import MetaAgg.DeletedFile
    def part(p: Int) = Map[String, Any]("dt" -> Int.box(p))
    def t(p: Int, rows: Long, lo: Long, hi: Long) =
      TupleAgg(part(p), rows, Map(Id -> rows),
        Map(Id -> (lo: Any)), Map(Id -> (hi: Any)), Set.empty, Set.empty)
    // un-deleted [3,9] dominates the deleted file's min side (3 ≤ 5)
    // but not its max side (9 < 20): min serves, max refuses
    val out = MetaAgg.applyDeletes(Seq(t(1, 10, 3, 9)),
      Seq(DeletedFile(t(1, 8, 5, 20), 2L)), needed).get.head
    assert(out.lo(Id) === 3L, "dominating un-deleted min serves")
    assert(!out.hi.contains(Id), "dominated max refuses (20 may be deleted)")
    assert(!out.poisoned(Id), "a dominated side must not poison the other")
    assert(out.rows === 16L && out.nonNull(Id) === 16L)
    // equality dominates too (the un-deleted bound is attained)
    val eq = MetaAgg.applyDeletes(Seq(t(2, 10, 5, 20)),
      Seq(DeletedFile(t(2, 8, 5, 20), 2L)), needed).get.head
    assert(eq.lo(Id) === 5L && eq.hi(Id) === 20L)
    // a FULLY-deleted file imposes no bound constraint
    val full = MetaAgg.applyDeletes(Seq(t(3, 10, 5, 9)),
      Seq(DeletedFile(t(3, 8, 1, 30), 8L)), needed).get.head
    assert(full.lo(Id) === 5L && full.hi(Id) === 9L && full.rows === 10L)
    // deleted-only tuple: count exact, bounds refuse (the extremum may
    // be among the deleted rows)
    val only = MetaAgg.applyDeletes(Seq.empty,
      Seq(DeletedFile(t(4, 8, 1, 30), 3L)), needed).get.head
    assert(only.rows === 5L && !only.lo.contains(Id) && !only.hi.contains(Id))
    assert(!only.poisoned(Id))
    // an ALL-NULL deleted file constrains nothing (its rows are null)
    val anDel = TupleAgg(part(5), 6, Map(Id -> 0L),
      Map.empty, Map.empty, Set(Id), Set.empty)
    val anOut = MetaAgg.applyDeletes(Seq(t(5, 10, 5, 9)),
      Seq(DeletedFile(anDel, 2L)), needed).get.head
    assert(anOut.lo(Id) === 5L && anOut.hi(Id) === 9L)
    // a POISONED deleted file poisons (its bounds are unknown, so
    // dominance is unverifiable)
    val poiDel = TupleAgg(part(6), 6, Map(Id -> 6L),
      Map.empty, Map.empty, Set.empty, Set(Id))
    val poiOut = MetaAgg.applyDeletes(Seq(t(6, 10, 5, 9)),
      Seq(DeletedFile(poiDel, 2L)), needed).get.head
    assert(poiOut.poisoned(Id))
    // taint propagates from either side
    val taintedBase = t(7, 10, 3, 9).copy(tainted = true)
    assert(MetaAgg.applyDeletes(Seq(taintedBase),
      Seq(DeletedFile(t(7, 8, 5, 9), 2L)), needed).get.head.tainted)
  }

  test("hostile bound types REFUSE (poison) on merge instead of throwing") {
    def t(lo: Option[Any], hi: Option[Any]) =
      TupleAgg(Map("dt" -> Int.box(1)), 5,
        Map(Id -> 5L),
        lo.map(Id -> _).toMap, hi.map(Id -> _).toMap,
        Set.empty, Set.empty)
    // a foreign/hostile partial carrying a non-integral bound under a
    // LongType column: the merge must poison, never MatchError
    val good = t(Some(3L), Some(9L))
    val hostile = t(Some("not-a-long"), Some(new Object))
    val m = MetaAgg.merge(good, hostile, needed)
    assert(m.poisoned(Id))
    assert(MetaAgg.cmpAny(Long.box(1L), "x").isEmpty)
    assert(MetaAgg.extremum(Seq(Long.box(1L), Int.box(2)), lower = true).isEmpty)
  }
}
