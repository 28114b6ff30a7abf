package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Output-type lint over EVERY oracle gate: the driver's pandas-layer
  * compare canonicalizes DuckDB DECIMAL results through float64 (whose
  * int128-scaled division differs from correctly-rounded in the last ulp —
  * the ib26/ib34 r7 reds), and float32 columns arrive as exact `Decimal`
  * vs float64 representations that hash-mismatch even on equal values.
  * The established discipline (verify SKILL.md: `dsumOut`, VARCHAR-encoded
  * raw decimals, DOUBLE-widened floats) is enforced here as an invariant:
  * no gate may emit DecimalType or FloatType anywhere in its output schema
  * — top level or nested inside array/map/struct (the driver's canon()
  * recurses into lists). Allowlist: nothing.
  */
class OutputTypeLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-lint").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def banned(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: ${dt.simpleString}")
    case FloatType      => Seq(s"$path: float")
    case ArrayType(et, _) => banned(et, s"$path[]")
    case MapType(kt, vt, _) =>
      banned(kt, s"$path.key") ++ banned(vt, s"$path.value")
    case StructType(fields) =>
      fields.toSeq.flatMap(f => banned(f.dataType, s"$path.${f.name}"))
    case _ => Nil
  }

  // One test per gate so a violation names its query directly; building
  // the DataFrame is enough (schema is known pre-execution for lazy plans;
  // write gates execute their setup, same as Verify does).
  for (q <- SparkEntry.all) {
    test(s"${q.name}: output schema has no DecimalType/FloatType") {
      val schema = q.build(spark, Sf).schema
      val hits = schema.fields.toSeq
        .flatMap(f => banned(f.dataType, f.name))
      assert(hits.isEmpty,
        s"driver-hasher-unsafe output columns (encode as VARCHAR/DOUBLE " +
        s"per verify SKILL.md): ${hits.mkString(", ")}")
    }
  }
}
