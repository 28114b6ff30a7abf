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
}
