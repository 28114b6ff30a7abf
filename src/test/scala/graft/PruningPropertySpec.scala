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
}
