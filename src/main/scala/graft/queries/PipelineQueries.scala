package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus pipeline composition: the individual
  * operators (quality scoring t02, LSH dedup clustering d06, deterministic
  * split assignment t06) chained into the selection a real data pipeline
  * materializes — documents that pass the quality filter, are their
  * duplicate-cluster's canonical keeper, and land in the train split.
  */
object PipelineQueries {

  private def toksAll: Column = split(trim(col("text")), "\\s+")

  /** The curated corpus at DOC level: quality-passing cluster keepers
    * with token counts and their deterministic split assignment (the
    * t02/d06/t06 composition p01 aggregates). */
  private def curated(s: SparkSession, dir: String): DataFrame = {
    val stop = array(Seq("the", "and", "is", "of", "to", "a", "in").map(lit): _*)
    val q = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toksAll).as("n_tok"),
        round(size(filter(toksAll, x => array_contains(stop, x))).cast("double")
            / size(toksAll) * 0.5
          + (lit(1.0) - (length(col("text"))
              - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
              / length(col("text"))) * 0.3
          + least(size(toksAll).cast("double") / 100.0, lit(1.0)) * 0.2, 6)
          .as("quality"))
    val keepers = DedupQueries.clusterLabels(s, dir)
      .filter(col("label") === col("doc_id")).select("doc_id")
    val bucket = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100
    q.join(keepers, "doc_id")
      .filter(col("quality") >= 0.5)
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val").otherwise("test"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "p01_train_corpus",
      // filter → dedup(keep cluster minimum) → split; per-source doc and
      // token counts audit what survives into the training corpus
      Some(s"""
        WITH ${DedupQueries.minhashCandSql},
        ${DedupQueries.clusterLabelsSql},
        q AS (
          SELECT doc_id, source,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
                 round(0.5 * (CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> list_contains(['the','and','is','of','to','a','in'], x))) AS DOUBLE)
                       / len(regexp_split_to_array(trim(text), '\\s+')))
                     + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                                    / length(text))
                     + 0.2 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0), 6)
                   AS quality
          FROM documents),
        surv AS (
          SELECT q.doc_id, q.source, q.n_tok
          FROM q JOIN l3 ON l3.doc_id = q.doc_id AND l3.label = q.doc_id
          WHERE q.quality >= 0.5
            AND ('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90)
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM surv GROUP BY source ORDER BY source"""),
      (s, dir) => curated(s, dir)
        .filter(col("bucket") < 90)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tok")).cast("long").as("n_tokens"))
        .orderBy("source")
    ),
    QueryDef(
      "p02_corpus_to_iceberg",
      // The pipeline's MATERIALIZATION leg: the curated corpus lands in
      // an Iceberg table partitioned by split, and the training job
      // reads its split back through partition pruning — files_ok pins
      // that a train-split scan plans strictly fewer files than the
      // table holds (identity-partition pruning), while the per-source
      // aggregates must match the p01 oracle exactly (the Iceberg round
      // trip loses nothing).
      Some(s"""
        WITH ${DedupQueries.minhashCandSql},
        ${DedupQueries.clusterLabelsSql},
        q AS (
          SELECT doc_id, source,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
                 round(0.5 * (CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> list_contains(['the','and','is','of','to','a','in'], x))) AS DOUBLE)
                       / len(regexp_split_to_array(trim(text), '\\s+')))
                     + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                                    / length(text))
                     + 0.2 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0), 6)
                   AS quality
          FROM documents),
        surv AS (
          SELECT q.doc_id, q.source, q.n_tok
          FROM q JOIN l3 ON l3.doc_id = q.doc_id AND l3.label = q.doc_id
          WHERE q.quality >= 0.5
            AND ('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90)
        SELECT CAST(TRUE AS BOOLEAN) AS files_ok, source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM surv GROUP BY source ORDER BY source"""),
      (s, dir) => {
        val table = java.nio.file.Files
          .createTempDirectory("graft_p02_").toString + "/corpus"
        graft.iceberg.IcebergWriter.write(
          curated(s, dir).select("doc_id", "source", "n_tok", "split")
            .repartition(3, col("split")),
          table, partitionBy = Seq("split" -> "identity"))
        val cond = col("split") === "train"
        import graft.iceberg.IcebergScan
        import graft.iceberg.IcebergScan.Options
        val total = IcebergScan.scan(s, table, Options(mode = "list_files"))
          .filter(col("type") === "data").agg(count(lit(1)).as("ft"))
        val kept = IcebergScan.scanFiltered(s, table, cond,
          Options(mode = "list_files"))
          .filter(col("type") === "data").agg(count(lit(1)).as("fk"))
        val agg = IcebergScan.scanFiltered(s, table, cond)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_tok")).cast("long").as("n_tokens"))
        agg.crossJoin(
            total.crossJoin(kept).select((col("fk") < col("ft")).as("files_ok")))
          .select("files_ok", "source", "n_docs", "n_tokens")
          .orderBy("source")
      }
    )
  )
}
