package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `graft_dec` ([[graft.functions.DoubleToDecimal18]]) must be
  * VALUE-identical (including null-ness) to the built-in non-ANSI
  * `cast(double AS decimal(18, scale))` it replaces in the money
  * pipeline (round 20): the driver hash-compares every declared query
  * against its DuckDB oracle, so a single row differing by 1 ulp of the
  * last decimal place is a correctness regression.
  *
  * The fast path rounds the exact binary product and falls back to the
  * reference arithmetic inside a ±band of every .5 boundary (band =
  * ulp(|x|)·10^scale — the gap between the shortest-repr decimal the
  * cast rounds and the exact binary value). These tests drive both the
  * interpreted eval and the codegen path (whole-stage codegen on a real
  * DataFrame), with directed adversarial values sitting exactly ON and
  * just off the boundaries.
  */
class DoubleToDecimalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-dec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reference is `try_cast` — the same rounding arithmetic as `cast`
    * with null on overflow instead of the ANSI error. graft_dec's ONE
    * documented divergence from the ANSI cast is exactly that (the same
    * posture as round 19's DecimalSum128): inside the non-overflow
    * domain — where every declared query lives, and which the
    * in-domain test below pins against the REAL ANSI cast — the values
    * are bit-identical. */
  private def compare(values: Seq[java.lang.Double], scale: Int): Unit = {
    import spark.implicits._
    val df = values.toDF("v")
    val rows = df
      .select(
        col("v"),
        call_function("graft_dec", col("v"), lit(scale)).as("fast"),
        expr(s"try_cast(v as decimal(18,$scale))").as("ref"))
      .collect()
    rows.foreach { r =>
      val v = if (r.isNullAt(0)) null else r.getDouble(0)
      val fast = if (r.isNullAt(1)) null else r.getDecimal(1)
      val ref = if (r.isNullAt(2)) null else r.getDecimal(2)
      assert(fast == ref,
        s"graft_dec($v, $scale) = $fast but cast gives $ref")
    }
  }

  // direct unit-level check too (interpreted eval path)
  private def compareUnit(x: Double, scale: Int): Unit = {
    val fast = graft.functions.DoubleToDecimal18.toDec(
      x, scale, math.pow(10d, scale))
    val ref = graft.functions.DoubleToDecimal18.slow(x, scale)
    assert((fast == null && ref == null) ||
           (fast != null && ref != null && fast.equals(ref)),
      s"toDec($x, $scale) = $fast but reference gives $ref")
  }

  test("directed boundary values, scale 6") {
    // values of the form (n + 0.5)/1e6 — the exact HALF_UP tie points —
    // across magnitudes, plus ulp-neighbourhoods of each
    val vals = Seq.newBuilder[java.lang.Double]
    for (nRaw <- Seq(0L, 1L, 12L, 999L, 123456L, 999999999L, 123456789012L);
         sign <- Seq(1L, -1L)) {
      val n = nRaw * sign
      val tie = (n + (if (n < 0) -0.5 else 0.5)) / 1e6
      vals += tie
      vals += Math.nextUp(tie); vals += Math.nextDown(tie)
      vals += Math.nextUp(Math.nextUp(tie)); vals += Math.nextDown(Math.nextDown(tie))
      val exact = n / 1e6
      vals += exact; vals += Math.nextUp(exact); vals += Math.nextDown(exact)
    }
    // binade edges: powers of two have asymmetric rounding intervals
    for (e <- Seq(-20, -1, 0, 1, 10, 20, 30, 40, 50); s <- Seq(1, -1)) {
      val p = s * math.pow(2, e)
      vals += p; vals += Math.nextUp(p); vals += Math.nextDown(p)
    }
    // specials and extremes
    vals += 0.0; vals += -0.0
    vals += Double.NaN; vals += Double.PositiveInfinity; vals += Double.NegativeInfinity
    vals += Double.MinPositiveValue; vals += -Double.MinPositiveValue
    vals += 4.9e-324; vals += 1e-300; vals += -1e-300
    // 18-digit overflow region for scale 6 (limit: |x| < 1e12)
    vals += 9.99999999999e11; vals += 1e12; vals += 1.0000000000001e12
    vals += -9.99999999999e11; vals += -1e12; vals += -1.0000000000001e12
    vals += 1e15; vals += 1e18; vals += Double.MaxValue; vals += -Double.MaxValue
    // guard boundary (fast path cutoff at |x|*1e6 = 1.125e15)
    vals += 1.124e9; vals += 1.126e9; vals += 2.147483648e9
    vals += null
    val all = vals.result()
    compare(all, 6)
    all.foreach(v => if (v != null) compareUnit(v, 6))
  }

  test("directed boundary values, scales 4 and 8") {
    for (scale <- Seq(4, 8)) {
      val pow = math.pow(10d, scale)
      val vals = Seq.newBuilder[java.lang.Double]
      for (nRaw <- Seq(0L, 1L, 999L, 123456L, 987654321L); sign <- Seq(1L, -1L)) {
        val n = nRaw * sign
        val tie = (n + (if (n < 0) -0.5 else 0.5)) / pow
        vals += tie; vals += Math.nextUp(tie); vals += Math.nextDown(tie)
        vals += n / pow
      }
      vals += 0.0; vals += Double.NaN; vals += 1e18; vals += -1e18
      val all = vals.result()
      compare(all, scale)
      all.foreach(v => if (v != null) compareUnit(v, scale))
    }
  }

  test("randomized sweep across magnitudes, scale 6 and 8") {
    val r = new scala.util.Random(20240818L)
    val vals = Seq.newBuilder[java.lang.Double]
    (1 to 200000).foreach { _ =>
      val mag = r.nextInt(26) - 10 // 1e-10 .. 1e15
      val v = (r.nextDouble() - 0.5) * math.pow(10, mag)
      vals += v
    }
    // money-shaped values: 2dp and 6dp decimals stored as doubles
    (1 to 100000).foreach { _ =>
      vals += r.nextInt(20000000).toDouble / 100.0 * (if (r.nextBoolean()) 1 else -1)
      vals += r.nextLong(2000000000000L).toDouble / 1e6
    }
    val all = vals.result()
    all.foreach { v => compareUnit(v, 6); compareUnit(v, 8) }
    // and through codegen in one DataFrame pass
    compare(all.take(50000), 6)
  }

  test("fast path actually fires on money-shaped data (not a fallback-only shim)") {
    // if the band logic were broken toward always-fallback, the perf win
    // would silently vanish; count fallbacks via a sample
    val r = new scala.util.Random(7L)
    var fast = 0
    var total = 0
    (1 to 100000).foreach { _ =>
      val x = r.nextInt(10000000).toDouble / 100.0
      val y = x * 1e6
      val n = Math.rint(y)
      val rr = (y - n) + Math.fma(x, 1e6, -y)
      val band = Math.ulp(x) * 1e6 + 1e-12
      total += 1
      if (Math.abs(rr) < 0.5 - band) fast += 1
    }
    assert(fast.toDouble / total > 0.99, s"fast-path rate $fast/$total")
  }

  test("identical to the ANSI cast inside the non-overflow domain") {
    import spark.implicits._
    val r = new scala.util.Random(99L)
    val vals: Seq[java.lang.Double] = (1 to 50000).map { _ =>
      java.lang.Double.valueOf(
        (r.nextDouble() - 0.5) * math.pow(10, r.nextInt(14) - 4)) // |x| < 5e9
    }
    val rows = vals.toDF("v")
      .select(
        call_function("graft_dec", col("v"), lit(6)).as("fast"),
        col("v").cast(DecimalType(18, 6)).as("ansi"))
      .collect()
    rows.foreach { row =>
      assert(row.getDecimal(0) == row.getDecimal(1),
        s"in-domain divergence: ${row.getDecimal(0)} vs ${row.getDecimal(1)}")
    }
  }

  test("analysis rejects non-double input") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L).toDF("v").select(call_function("graft_dec", col("v"), lit(6))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("double") ||
           ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
