package graft.iceberg

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.types._

import IcebergModel._
import IcebergPruning._

/** Property tests for driver-side file pruning — the code that silently
  * drops whole files when a comparison is subtly wrong. Two families:
  * encode∘decode round trips per type (writer bounds must mean the same
  * thing the pruner reads), and the safety invariant: for random files +
  * predicates, NO file containing a predicate-satisfying row is ever
  * pruned (conservative-keep contract; VERDICT r3 directive #3). */
object PruningPropertySpec extends Properties("iceberg.pruning") {

  // ---- encodeBound ∘ decodeBound round trips ------------------------------

  property("int bound round-trips to its numeric domain") = forAll { (i: Int) =>
    decodeBound(IntegerType, encodeBound(IntegerType, Int.box(i)).get)
      .contains(java.math.BigDecimal.valueOf(i.toLong))
  }

  property("long bound round-trips") = forAll { (l: Long) =>
    decodeBound(LongType, encodeBound(LongType, Long.box(l)).get)
      .contains(java.math.BigDecimal.valueOf(l))
  }

  property("double bound round-trips") =
    forAll(Gen.choose(-1e12, 1e12)) { d =>
      decodeBound(DoubleType, encodeBound(DoubleType, Double.box(d)).get)
        .contains(new java.math.BigDecimal(d.toString))
    }

  property("float bound round-trips") =
    forAll(Gen.choose(-1e6f, 1e6f)) { f =>
      decodeBound(FloatType, encodeBound(FloatType, Float.box(f)).get)
        .contains(new java.math.BigDecimal(f.toString))
    }

  property("date bound round-trips to epoch days") =
    forAll(Gen.choose(-100000, 100000)) { days =>
      decodeBound(DateType, encodeBound(DateType, Int.box(days)).get)
        .contains(days.toLong)
    }

  property("timestamp bound round-trips to epoch micros") = forAll { (l: Long) =>
    decodeBound(TimestampNTZType, encodeBound(TimestampNTZType, Long.box(l)).get)
      .contains(l)
  }

  property("string bound round-trips exactly") =
    forAll(Gen.alphaNumStr) { s =>
      decodeBound(StringType, encodeBound(StringType, s).get).contains(s)
    }

  property("decimal bound round-trips at the declared scale") =
    forAll(Gen.choose(-1000000L, 1000000L)) { unscaled =>
      val dt = DecimalType(15, 2)
      val v = java.math.BigDecimal.valueOf(unscaled, 2)
      decodeBound(dt, encodeBound(dt, v).get).contains(v)
    }

  // ---- safety invariant: column bounds ------------------------------------

  private val longSchema = Seq(Column(1, "x", LongType, required = false))
  private val genOp: Gen[Op] = Gen.oneOf(Eq, Lt, Le, Gt, Ge)
  private def sat(op: Op, x: Long, v: Long): Boolean = op match {
    case Eq => x == v; case Lt => x < v; case Le => x <= v
    case Gt => x > v; case Ge => x >= v
  }

  property("bounds pruning never drops a file holding a matching row") =
    forAll(
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))),
      genOp, Gen.choose(-1100L, 1100L)) { (files, op, v) =>
      val entries = files.zipWithIndex.map { case (vals, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = vals.size.toLong,
          lowerBounds = Map(1 -> encodeBound(LongType, Long.box(vals.min)).get),
          upperBounds = Map(1 -> encodeBound(LongType, Long.box(vals.max)).get))
      }
      val kept = prune(entries, Seq(ColPredicate("x", op, v)), Seq.empty, longSchema)
        .map(_.filePath).toSet
      files.zipWithIndex.forall { case (vals, i) =>
        !vals.exists(sat(op, _, v)) || kept.contains(s"f$i")
      }
    }

  property("files without bounds are always kept") =
    forAll(genOp, Gen.choose(-1000L, 1000L)) { (op, v) =>
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L)
      prune(Seq(e), Seq(ColPredicate("x", op, v)), Seq.empty, longSchema).nonEmpty
    }

  property("unknown predicate columns prune nothing") =
    forAll(genOp, Gen.choose(-1000L, 1000L)) { (op, v) =>
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
        lowerBounds = Map(1 -> encodeBound(LongType, Long.box(0L)).get),
        upperBounds = Map(1 -> encodeBound(LongType, Long.box(0L)).get))
      prune(Seq(e), Seq(ColPredicate("nope", op, v)), Seq.empty, longSchema).nonEmpty
    }

  property("IN-list pruning never drops a file holding a listed value") =
    forAll(
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))),
      Gen.nonEmptyListOf(Gen.choose(-1100L, 1100L))) { (files, vs) =>
      val entries = files.zipWithIndex.map { case (vals, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = vals.size.toLong,
          lowerBounds = Map(1 -> encodeBound(LongType, Long.box(vals.min)).get),
          upperBounds = Map(1 -> encodeBound(LongType, Long.box(vals.max)).get))
      }
      val kept = prune(entries, Seq(ColPredicate("x", In, vs)), Seq.empty, longSchema)
        .map(_.filePath).toSet
      files.zipWithIndex.forall { case (vals, i) =>
        !vals.exists(vs.contains) || kept.contains(s"f$i")
      }
    }

  property("null-count pruning never drops a file that could match") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 10L), Gen.choose(0L, 10L))),
      Gen.oneOf(true, false)) { (shapes, wantNull) =>
      // a file = (nullCount, nonNullCount); recordCount is their sum
      val entries = shapes.zipWithIndex.map { case ((nulls, nonNulls), i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = nulls + nonNulls,
          nullCounts = Map(1 -> nulls))
      }
      val op = if (wantNull) IsNull else NotNull
      val kept = prune(entries, Seq(ColPredicate("x", op, null)), Seq.empty, longSchema)
        .map(_.filePath).toSet
      shapes.zipWithIndex.forall { case ((nulls, nonNulls), i) =>
        val matches = if (wantNull) nulls > 0 else nonNulls > 0
        !matches || kept.contains(s"f$i")
      }
    }

  // ---- safety invariant: day-transform partition ordinals -----------------

  private val dateSchema = Seq(Column(1, "dt", DateType, required = false))
  private val daySpec = Seq(PartitionFieldSpec("dt_day", "day", sourceId = 1, fieldId = 1000))
  private def satDate(op: Op, row: Long, v: java.time.LocalDate): Boolean = {
    val c = java.lang.Long.compare(row, v.toEpochDay)
    op match {
      case Eq => c == 0; case Lt => c < 0; case Le => c <= 0
      case Gt => c > 0; case Ge => c >= 0
    }
  }

  property("day-partition pruning never drops a file holding a matching row") =
    forAll(
      // each file = one day ordinal (a day-partitioned file holds one day)
      Gen.nonEmptyListOf(Gen.choose(19000L, 20000L)),
      genOp, Gen.choose(19000L, 20000L)) { (fileDays, op, vDay) =>
      val v = java.time.LocalDate.ofEpochDay(vDay)
      val entries = fileDays.zipWithIndex.map { case (day, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("dt_day" -> Int.box(day.toInt)))
      }
      val kept = prune(entries, Seq(ColPredicate("dt", op, v)), daySpec, dateSchema)
        .map(_.filePath).toSet
      fileDays.zipWithIndex.forall { case (day, i) =>
        !satDate(op, day, v) || kept.contains(s"f$i")
      }
    }

  // ---- hostile predicate values must degrade to keep, never crash ---------
  // (auto-extraction feeds arbitrary user literals into the pruner)

  private val doubleSchema = Seq(Column(1, "v", DoubleType, required = false))

  property("NaN/Infinity predicate values keep all files without crashing") =
    forAll(genOp, Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      (op, bad) =>
        val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
          lowerBounds = Map(1 -> encodeBound(DoubleType, Double.box(0.0)).get),
          upperBounds = Map(1 -> encodeBound(DoubleType, Double.box(1.0)).get))
        prune(Seq(e), Seq(ColPredicate("v", op, bad)), Seq.empty, doubleSchema).nonEmpty
    }

  property("unparseable date strings keep all files without crashing") =
    forAll(genOp, Gen.oneOf("2024-1-7", "not-a-date", "")) { (op, bad) =>
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
        partition = Map("dt_day" -> Int.box(19729)),
        lowerBounds = Map(1 -> encodeBound(DateType, Int.box(19729)).get),
        upperBounds = Map(1 -> encodeBound(DateType, Int.box(19729)).get))
      prune(Seq(e), Seq(ColPredicate("dt", op, bad)), daySpec, dateSchema).nonEmpty
    }

  // Catalyst date literals arrive as epoch-day Integers; the day transform
  // must prune on them even when manifests carry NO column bounds (the
  // foreign-written-table case where partition values are all we have).
  property("epoch-day integer predicates prune via day-transform partitions") =
    forAll(Gen.choose(19000, 19997)) { day0 =>
      val entries = (0 until 3).map { i =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("dt_day" -> Int.box(day0 + i)))
      }
      val kept = prune(
        entries, Seq(ColPredicate("dt", Eq, Int.box(day0 + 1))), daySpec, dateSchema)
      kept.map(_.filePath) == Seq("f1")
    }

  // ---- safety invariant: bucket / truncate / hour transforms --------------

  property("bucket-partition pruning never drops the matching bucket's file") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-10000L, 10000L)),
      Gen.choose(-10000L, 10000L), Gen.choose(1, 64)) { (fileVals, v, n) =>
      val spec = Seq(PartitionFieldSpec("x_bucket", s"bucket[$n]", sourceId = 1, fieldId = 1000))
      val entries = fileVals.zipWithIndex.map { case (x, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("x_bucket" -> Int.box(IcebergTransforms.bucketLong(x, n))))
      }
      val kept = prune(entries, Seq(ColPredicate("x", Eq, v)), spec, longSchema)
        .map(_.filePath).toSet
      fileVals.zipWithIndex.forall { case (x, i) =>
        x != v || kept.contains(s"f$i")
      }
    }

  property("bucket pruning keeps everything for range operators") =
    forAll(Gen.oneOf[Op](Lt, Le, Gt, Ge), Gen.choose(-100L, 100L), Gen.choose(1, 16)) {
      (op, v, n) =>
        val spec = Seq(PartitionFieldSpec("x_bucket", s"bucket[$n]", sourceId = 1, fieldId = 1000))
        val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
          partition = Map("x_bucket" -> Int.box(0)))
        prune(Seq(e), Seq(ColPredicate("x", op, v)), spec, longSchema).nonEmpty
    }

  property("truncate-partition pruning over longs never drops a matching file") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)),
      genOp, Gen.choose(-1100L, 1100L), Gen.choose(1, 50)) { (fileVals, op, v, w) =>
      val spec = Seq(PartitionFieldSpec("x_trunc", s"truncate[$w]", sourceId = 1, fieldId = 1000))
      val entries = fileVals.zipWithIndex.map { case (x, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("x_trunc" -> Long.box(IcebergTransforms.truncateLong(x, w.toLong))))
      }
      val kept = prune(entries, Seq(ColPredicate("x", op, v)), spec, longSchema)
        .map(_.filePath).toSet
      fileVals.zipWithIndex.forall { case (x, i) =>
        !sat(op, x, v) || kept.contains(s"f$i")
      }
    }

  private val strSchema = Seq(Column(1, "s", StringType, required = false))

  property("truncate-partition pruning over strings never drops a matching file") =
    forAll(
      // "𐐷" is a supplementary code point (2 UTF-16 units) — string pieces,
      // since it cannot be a Char literal
      Gen.nonEmptyListOf(Gen.listOfN(6, Gen.oneOf("a", "b", "c", "é", "𐐷")).map(_.mkString)),
      genOp,
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "é", "𐐷")).map(_.mkString),
      Gen.choose(1, 5)) { (fileVals, op, v, w) =>
      val spec = Seq(PartitionFieldSpec("s_trunc", s"truncate[$w]", sourceId = 1, fieldId = 1000))
      def satS(op: Op, x: String): Boolean = {
        val c = utf8Compare(x, v)
        op match {
          case Eq => c == 0; case Lt => c < 0; case Le => c <= 0
          case Gt => c > 0; case Ge => c >= 0
        }
      }
      val entries = fileVals.zipWithIndex.map { case (x, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("s_trunc" -> IcebergTransforms.truncateString(x, w)))
      }
      val kept = prune(entries, Seq(ColPredicate("s", op, v)), spec, strSchema)
        .map(_.filePath).toSet
      fileVals.zipWithIndex.forall { case (x, i) =>
        !satS(op, x) || kept.contains(s"f$i")
      }
    }

  private val tsSchema = Seq(Column(1, "ts", TimestampNTZType, required = false))

  property("hour-partition pruning never drops a file holding a matching row") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 1000L * 3600000000L)),
      genOp, Gen.choose(0L, 1000L * 3600000000L)) { (fileMicros, op, v) =>
      val spec = Seq(PartitionFieldSpec("ts_hour", "hour", sourceId = 1, fieldId = 1000))
      val entries = fileMicros.zipWithIndex.map { case (us, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("ts_hour" ->
            Int.box(IcebergTransforms.hourOrdinalOfMicros(us).toInt)))
      }
      val kept = prune(entries, Seq(ColPredicate("ts", op, Long.box(v))), spec, tsSchema)
        .map(_.filePath).toSet
      fileMicros.zipWithIndex.forall { case (us, i) =>
        !sat(op, us, v) || kept.contains(s"f$i")
      }
    }

  // Timestamp predicates must also project through the DATE transforms
  // (days(ts) is the most common Iceberg layout).
  property("day-partition pruning works for timestamp-typed predicates") =
    forAll(Gen.choose(0L, 20000L), genOp) { (day0, op) =>
      val spec = Seq(PartitionFieldSpec("ts_day", "day", sourceId = 1, fieldId = 1000))
      val entries = (0 until 3).map { i =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("ts_day" -> Long.box(day0 + i)))
      }
      // noon inside the middle day
      val v = (day0 + 1) * 86400000000L + 43200000000L
      val kept = prune(entries, Seq(ColPredicate("ts", op, Long.box(v))), spec, tsSchema)
        .map(_.filePath).toSet
      // middle day always contains micros satisfying any op vs noon
      kept.contains("f1")
    }

  property("identity-partition pruning never drops a matching file") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-100L, 100L)),
      genOp, Gen.choose(-110L, 110L)) { (fileVals, op, v) =>
      val spec = Seq(PartitionFieldSpec("x", "identity", sourceId = 1, fieldId = 1000))
      val entries = fileVals.zipWithIndex.map { case (x, i) =>
        ManifestEntry(status = 1, content = 0, filePath = s"f$i",
          fileFormat = "PARQUET", recordCount = 1L,
          partition = Map("x" -> Long.box(x)))
      }
      val kept = prune(entries, Seq(ColPredicate("x", op, v)), spec, longSchema)
        .map(_.filePath).toSet
      fileVals.zipWithIndex.forall { case (x, i) =>
        !sat(op, x, v) || kept.contains(s"f$i")
      }
    }

  // ---- mistyped predicate values against STRING columns -------------------
  // Via Options.filters a caller can hand a non-string value against a
  // string column. The residual then compares under Spark CAST semantics
  // (string "037" == int 37), while toString-projection would prune the
  // bucket/prefix of "37" only — so the pruner must degrade to keep.

  property("non-string predicate values never prune string bucket partitions") =
    forAll(genOp, Gen.choose(0, 1000), Gen.choose(1, 32)) { (op, v, n) =>
      val spec = Seq(PartitionFieldSpec("s_bucket", s"bucket[$n]", sourceId = 1, fieldId = 1000))
      // a file that holds "037"-style rows: bucket of the PADDED rendering
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
        partition = Map("s_bucket" ->
          Int.box(IcebergTransforms.bucketOf(IcebergTransforms.hashString(f"$v%03d"), n))))
      prune(Seq(e), Seq(ColPredicate("s", op, Int.box(v))), spec, strSchema).nonEmpty
    }

  property("non-string predicate values never prune string truncate partitions") =
    forAll(genOp, Gen.choose(0, 1000), Gen.choose(1, 5)) { (op, v, w) =>
      val spec = Seq(PartitionFieldSpec("s_trunc", s"truncate[$w]", sourceId = 1, fieldId = 1000))
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
        partition = Map("s_trunc" -> IcebergTransforms.truncateString(f"$v%03d", w)))
      prune(Seq(e), Seq(ColPredicate("s", op, Int.box(v))), spec, strSchema).nonEmpty
    }

  property("non-string predicate values never prune via string column bounds") =
    forAll(genOp, Gen.choose(0, 1000)) { (op, v) =>
      val padded = f"$v%03d" // CASTs equal to v but compares differently as text
      val e = ManifestEntry(1, 0, "f0", "PARQUET", 1L,
        lowerBounds = Map(1 -> encodeBound(StringType, padded).get),
        upperBounds = Map(1 -> encodeBound(StringType, padded).get))
      prune(Seq(e), Seq(ColPredicate("s", op, Int.box(v))), Seq.empty, strSchema).nonEmpty
    }

  // ---- manifest-level pruning: at least as conservative as entry level ----
  // (round 10). The soundness contract for manifestMayMatch: whenever
  // entry-level prune() keeps ANY file of a manifest, the manifest's
  // summaries — derived by the writer's rule (bounds only when every
  // entry carries a non-null value; else unconstrained) — must keep the
  // whole manifest. A violation is silent data loss at planning time.

  private val idLongSpec =
    Seq(PartitionFieldSpec("x", "identity", sourceId = 1, fieldId = 1000))

  private def longSummary(vals: Seq[Option[Long]]): Seq[FieldSummary] = Seq(
    if (vals.exists(_.isEmpty)) FieldSummary(containsNull = true)
    else {
      val ns = vals.flatten
      FieldSummary(containsNull = false, containsNan = None,
        lowerBound = encodeBound(LongType, Long.box(ns.min)),
        upperBound = encodeBound(LongType, Long.box(ns.max)))
    })

  property("manifest pruning (identity) keeps whenever entry pruning keeps") =
    forAll(
      Gen.nonEmptyListOf(Gen.option(Gen.choose(-1000L, 1000L))),
      genOp, Gen.choose(-1100L, 1100L)) { (fileVals, op, v) =>
      val entries = fileVals.zipWithIndex.map { case (pv, i) =>
        ManifestEntry(1, 0, s"f$i", "PARQUET", 1L,
          partition = pv.map(x => Map("x" -> (Long.box(x): Any))).getOrElse(Map.empty))
      }
      val preds = Seq(ColPredicate("x", op, Long.box(v)))
      val anyKept = prune(entries, preds, idLongSpec, longSchema).nonEmpty
      !anyKept || manifestMayMatch(longSummary(fileVals), idLongSpec, longSchema, preds)
    }

  property("manifest pruning (identity, IN) keeps whenever entry pruning keeps") =
    forAll(
      Gen.nonEmptyListOf(Gen.option(Gen.choose(-1000L, 1000L))),
      Gen.nonEmptyListOf(Gen.choose(-1100L, 1100L))) { (fileVals, vs) =>
      val entries = fileVals.zipWithIndex.map { case (pv, i) =>
        ManifestEntry(1, 0, s"f$i", "PARQUET", 1L,
          partition = pv.map(x => Map("x" -> (Long.box(x): Any))).getOrElse(Map.empty))
      }
      val preds = Seq(ColPredicate("x", In, vs.map(Long.box)))
      val anyKept = prune(entries, preds, idLongSpec, longSchema).nonEmpty
      !anyKept || manifestMayMatch(longSummary(fileVals), idLongSpec, longSchema, preds)
    }

  private def daySummary(days: Seq[Option[Int]]): Seq[FieldSummary] = Seq(
    if (days.exists(_.isEmpty)) FieldSummary(containsNull = true)
    else {
      val ns = days.flatten
      FieldSummary(containsNull = false, containsNan = None,
        lowerBound = encodeBound(IntegerType, Int.box(ns.min)),
        upperBound = encodeBound(IntegerType, Int.box(ns.max)))
    })

  property("manifest pruning (day transform) keeps whenever entry pruning keeps") =
    forAll(
      Gen.nonEmptyListOf(Gen.option(Gen.choose(19000, 20000))),
      genOp, Gen.choose(19000L, 20000L)) { (fileDays, op, vDay) =>
      val v = java.time.LocalDate.ofEpochDay(vDay)
      val entries = fileDays.zipWithIndex.map { case (pd, i) =>
        ManifestEntry(1, 0, s"f$i", "PARQUET", 1L,
          partition = pd.map(d => Map("dt_day" -> (Int.box(d): Any))).getOrElse(Map.empty))
      }
      val preds = Seq(ColPredicate("dt", op, v))
      val anyKept = prune(entries, preds, daySpec, dateSchema).nonEmpty
      !anyKept || manifestMayMatch(daySummary(fileDays), daySpec, dateSchema, preds)
    }

  // IsNull compares against GROUND TRUTH, not the entry pruner: with no
  // recorded null counts the entry pruner keeps out of ignorance, while
  // contains_null is real knowledge — pruning an all-non-null manifest
  // for IsNull is correct. The invariant is: any file that MAY hold null
  // source values (absent/unconstrained partition value) keeps the
  // manifest.
  property("manifest pruning (IsNull) keeps any manifest that may hold nulls") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(-1000L, 1000L)))) { fileVals =>
      val preds = Seq(ColPredicate("x", IsNull, null))
      val mayHoldNull = fileVals.exists(_.isEmpty)
      !mayHoldNull ||
        manifestMayMatch(longSummary(fileVals), idLongSpec, longSchema, preds)
    }

  // genuinely NON-COMPARABLE values only: an Int predicate against a Long
  // column is sound numeric widening (pruning it is correct), so it does
  // not belong here
  property("hostile predicate values keep manifests without crashing") =
    forAll(genOp,
      Gen.oneOf[Any](Double.NaN, "not-a-number", "", null)) { (op, bad) =>
      val sums = longSummary(Seq(Some(1L), Some(5L)))
      manifestMayMatch(sums, idLongSpec, longSchema, Seq(ColPredicate("x", op, bad)))
    }
}
