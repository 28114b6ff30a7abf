package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** The custom codegen'd `graft_dot` Catalyst expression: value parity with
  * the higher-order-function formulation, null/length semantics, SQL
  * registration, and mixed element types. */
class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4").appName("graft-fns").getOrCreate()
    GraftSql.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("graft_dot equals the zip_with + aggregate fold bit-for-bit") {
    import spark.implicits._
    val r = new scala.util.Random(1)
    val rows = Seq.fill(50)((
      Array.fill(64)(r.nextFloat() * 2 - 1),
      Array.fill(64)(r.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("fast", call_function("graft_dot", col("a"), col("b")))
      .withColumn("slow", aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("graft_dot handles mixed numeric element types (float × int)") {
    import spark.implicits._
    val df = Seq((Array(1.5f, 2.5f), Array(3, 4))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    assert(df.collect()(0).getDouble(0) === 1.5 * 3 + 2.5 * 4)
  }

  test("graft_dot null semantics: null array, null element, length mismatch") {
    val df = spark.sql("""
      SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a,
             graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS b,
             graft_dot(array(1.0D), array(1.0D, 2.0D)) AS c,
             graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""")
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) === 11.0)
  }

  test("graft_dot rejects non-numeric arrays at analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric"))
  }

  test("graft_dot works via the session-extensions injection path") {
    val fresh = spark.newSession()
    // fresh session shares the extensions-less registry; runtime register
    GraftSql.register(fresh)
    assert(fresh.sql("SELECT graft_dot(array(2.0D), array(8.0D))")
      .collect()(0).getDouble(0) === 16.0)
  }

  test("graft_nfc normalizes decomposed sequences, passes NFC through, nulls propagate") {
    import spark.implicits._
    val decomposed = "e\u0301"   // e + COMBINING ACUTE, 3 UTF-8 bytes
    val precomposed = "\u00e9"   // é, 2 UTF-8 bytes
    val ring = "A\u030a"         // A + COMBINING RING
    val ringNfc = "\u00c5"       // Å
    val df = Seq(decomposed, "already nfc", null, ring).toDF("s")
      .selectExpr("graft_nfc(s) AS n", "octet_length(graft_nfc(s)) AS b",
        "graft_nfc(graft_nfc(s)) AS nn")
    val rows = df.collect()
    assert(rows(0).getString(0) == precomposed)
    assert(rows(0).getInt(1) == 2)
    assert(rows(0).getString(2) == precomposed) // idempotent
    assert(rows(1).getString(0) == "already nfc")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    assert(rows(3).getString(0) == ringNfc)
    // untyped NULL literal → NULL (DuckDB nfc_normalize(NULL) parity)
    assert(spark.sql("SELECT graft_nfc(NULL)").collect()(0).isNullAt(0))
    // non-string input fails analysis
    val e = intercept[Exception] {
      spark.sql("SELECT graft_nfc(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
