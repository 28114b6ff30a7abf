package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every capability the engine exposes, as (name → Spark program) plus an
    * optional DuckDB oracle. Assembled from the per-domain registries. */
  def all: Seq[QueryDef] =
    graft.queries.Relational.defs ++
    graft.queries.Relational2.defs ++
    graft.queries.TextQueries.defs ++
    graft.queries.DedupQueries.defs ++
    graft.queries.MultimodalQueries.defs ++
    graft.queries.PipelineQueries.defs ++
    graft.queries.IcebergQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    // NOTE: no stripMargin — SQL lines may legitimately start with `||`.
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
