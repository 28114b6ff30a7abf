package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver's correctness gate.
  *
  * @param name   stable key; shows up in CORRECTNESS_r{N}.json
  * @param oracle equivalent ANSI SQL runnable by DuckDB 1.0 over the same
  *               parquet tables (bare table names); None → rows-only check
  * @param build  Spark-first implementation reading from `dir`
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame
)

object Tables {
  /** All driver-generated tables live as one parquet file/dir per table. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads as a raw long (SPARK-40819). Normalize to TIMESTAMP_NTZ at
    * microsecond precision — the same value DuckDB sees after
    * CAST(ts AS TIMESTAMP). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
