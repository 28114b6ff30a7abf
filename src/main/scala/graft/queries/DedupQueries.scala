package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deduplication + similarity-search operators for a training-data
  * pipeline: exact-hash dedup, MinHash+LSH banding, SimHash, blocked
  * n-gram Jaccard, embedding cosine near-dup, and brute-force cosine
  * top-k ANN.
  *
  * Cross-engine determinism: all hashes are md5 hex strings (identical in
  * Spark and DuckDB); dot products cast each per-row double product to
  * DECIMAL(38,12) so the aggregation is exact, and final cosines are
  * rounded to 4 dp to absorb the engines' decimal→double cast wobble.
  */
object DedupQueries {

  private def toks: Column = array_distinct(split(trim(col("text")), "\\s+"))

  /** Distinct word-bigram shingles: unigrams over the synthetic tiny
    * vocabulary collide so much that LSH bands select ~90% of all pairs;
    * bigrams give the shingle space real discriminating power. */
  private def bigramShingles: Column = array_distinct(expr(
    """transform(sequence(1, size(__t) - 1),
                 i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"""))

  /** 16 MinHash signatures: min over shingles of md5(i + ":" + shingle). */
  private val NumHashes = 16
  private val RowsPerBand = 4
  private val NumBands = NumHashes / RowsPerBand

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "d01_dedup_exact",
      Some("""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_unique,
               COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_norm_unique
        FROM documents"""),
      (s, dir) =>
        Tables.load(s, dir, "documents").agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_unique"),
          countDistinct(md5(lower(regexp_replace(col("text"), "\\s+", " "))
            .cast("binary"))).as("n_norm_unique"))
    ),
    QueryDef(
      "d02_minhash_lsh_pairs",
      // shingle→minhash→band→bucket-join candidate generation
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(regexp_split_to_array(trim(text), '\\s+'))),
                   i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' '
                        || regexp_split_to_array(trim(text), '\\s+')[i + 1]))) AS w
          FROM documents),
        mh AS (
          SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || w)) AS mh
          FROM tok, range($NumHashes) t(i)
          GROUP BY doc_id, i),
        band AS (
          SELECT doc_id, i // $RowsPerBand AS b, md5(string_agg(mh, '|' ORDER BY i)) AS sig
          FROM mh GROUP BY doc_id, i // $RowsPerBand)
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM band a JOIN band c ON a.b = c.b AND a.sig = c.sig AND a.doc_id < c.doc_id
        ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .withColumn("__t", split(trim(col("text")), "\\s+"))
          .select(col("doc_id"), explode(bigramShingles).as("w"))
        val mhCols = (0 until NumHashes).map { i =>
          min(md5(concat(lit(i.toString), lit(":"), col("w")).cast("binary"))).as(s"mh$i")
        }
        val mh = tok.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
        val bandSigs = (0 until NumBands).map { b =>
          md5(concat_ws("|",
            (0 until RowsPerBand).map(r => col(s"mh${RowsPerBand * b + r}")): _*)
            .cast("binary"))
        }
        val bands = mh.select(col("doc_id"),
          posexplode(array(bandSigs: _*)).as(Seq("b", "sig")))
        val a = bands.as("a"); val c = bands.as("c")
        a.join(c, col("a.b") === col("c.b") && col("a.sig") === col("c.sig") &&
                  col("a.doc_id") < col("c.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"))
          .distinct()
          .orderBy("doc_a", "doc_b")
      }
    ),
    QueryDef(
      "d03_simhash",
      // 32-bit SimHash: per-bit majority vote over token md5s
      Some("""
        WITH tok AS (
          SELECT doc_id, ('0x' || substring(md5(unnest(list_distinct(
                   regexp_split_to_array(trim(text), '\s+')))), 1, 8))::BIGINT AS v
          FROM documents),
        bits AS (
          SELECT doc_id, j,
                 CASE WHEN SUM(CASE WHEN ((v >> j) & 1) = 1 THEN 1 ELSE -1 END) > 0
                      THEN 1 ELSE 0 END AS bit
          FROM tok, range(32) t(j)
          GROUP BY doc_id, j)
        SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(toks).as("w"))
          .withColumn("v", conv(substring(md5(col("w").cast("binary")), 1, 8), 16, 10).cast("long"))
        val bitSums = (0 until 32).map { j =>
          sum(when(shiftright(col("v"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
        }
        val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        val simhash = (0 until 32)
          .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        agg.select(col("doc_id"), simhash.cast("long").as("simhash")).orderBy("doc_id")
      }
    ),
    QueryDef(
      "d04_jaccard_pairs",
      // blocked (same-lang) pairwise token-set Jaccard ≥ 0.7
      Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 list_distinct(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents)
        SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
               round(CAST(len(list_intersect(a.w, c.w)) AS DOUBLE)
                     / len(list_distinct(a.w || c.w)), 6) AS jaccard
        FROM t a JOIN t c ON a.lang = c.lang AND a.doc_id < c.doc_id
        WHERE round(CAST(len(list_intersect(a.w, c.w)) AS DOUBLE)
                    / len(list_distinct(a.w || c.w)), 6) >= 0.7
        ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        // Self-join on lang has only a handful of distinct keys — a shuffle
        // join would put each language in ONE task. The doc set (id, lang,
        // token array) is tiny relative to the pair count, so broadcast one
        // side and repartition the streamed side for full parallelism.
        val t = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), toks.as("w"))
        val a = t.repartition(64, col("doc_id")).as("a")
        val c = t.as("c")
        a.join(broadcast(c),
            col("a.lang") === col("c.lang") && col("a.doc_id") < col("c.doc_id"))
          .select(
            col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
            round(size(array_intersect(col("a.w"), col("c.w"))).cast("double")
              / size(array_union(col("a.w"), col("c.w"))), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.7)
          .orderBy("doc_a", "doc_b")
      }
    ),
    QueryDef(
      "d05_embedding_neardup",
      // cosine ≥ 0.25 pairs within the same label (blocking key)
      Some("""
        WITH x AS (
          SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        norms AS (
          SELECT vec_id, SUM(CAST(v * v AS DECIMAL(38,12))) AS nn
          FROM x GROUP BY vec_id),
        dots AS (
          SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                 SUM(CAST(a.v * c.v AS DECIMAL(38,12))) AS dot
          FROM x a
          JOIN embeddings ea ON a.vec_id = ea.vec_id
          JOIN x c ON a.i = c.i AND a.vec_id < c.vec_id
          JOIN embeddings ec ON c.vec_id = ec.vec_id AND ea.label = ec.label
          GROUP BY 1, 2)
        SELECT vec_a, vec_b,
               round(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 4) AS cos
        FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE round(CAST(dot AS DOUBLE)
                    / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 4) >= 0.25
        ORDER BY vec_a, vec_b"""),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val x = e.select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "v0")))
          .withColumn("v", col("v0").cast("double")).drop("v0")
        val norms = x.groupBy("vec_id")
          .agg(sum((col("v") * col("v")).cast(DecimalType(38, 12))).as("nn"))
        val a = x.as("a"); val c = x.as("c")
        val dots = a.join(c,
            col("a.label") === col("c.label") && col("a.i") === col("c.i") &&
            col("a.vec_id") < col("c.vec_id"))
          .groupBy(col("a.vec_id").as("vec_a"), col("c.vec_id").as("vec_b"))
          .agg(sum((col("a.v") * col("c.v")).cast(DecimalType(38, 12))).as("dot"))
        dots
          .join(norms.as("na"), col("na.vec_id") === col("vec_a"))
          .join(norms.as("nb"), col("nb.vec_id") === col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            round(col("dot").cast("double")
              / (sqrt(col("na.nn").cast("double")) * sqrt(col("nb.nn").cast("double"))), 4)
              .as("cos"))
          .filter(col("cos") >= 0.25)
          .orderBy("vec_a", "vec_b")
      }
    ),
    QueryDef(
      "a01_ann_bruteforce_topk",
      // exact cosine top-3 neighbors for query vectors vec_id < 5
      Some("""
        WITH x AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        norms AS (
          SELECT vec_id, SUM(CAST(v * v AS DECIMAL(38,12))) AS nn
          FROM x GROUP BY vec_id),
        dots AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 SUM(CAST(q.v * c.v AS DECIMAL(38,12))) AS dot
          FROM x q JOIN x c ON q.i = c.i AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 5
          GROUP BY 1, 2),
        scored AS (
          SELECT query_id, neighbor_id,
                 round(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))), 4) AS cos
          FROM dots
          JOIN norms nq ON nq.vec_id = query_id
          JOIN norms nc ON nc.vec_id = neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, neighbor_id, cos, rk FROM ranked
        WHERE rk <= 3 ORDER BY query_id, rk"""),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v0")))
          .withColumn("v", col("v0").cast("double")).drop("v0")
        val norms = x.groupBy("vec_id")
          .agg(sum((col("v") * col("v")).cast(DecimalType(38, 12))).as("nn"))
        val q = x.filter(col("vec_id") < 5).as("q")
        val c = x.as("c")
        val dots = q.join(c, col("q.i") === col("c.i") && col("q.vec_id") =!= col("c.vec_id"))
          .groupBy(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
          .agg(sum((col("q.v") * col("c.v")).cast(DecimalType(38, 12))).as("dot"))
        val scored = dots
          .join(broadcast(norms.as("nq")), col("nq.vec_id") === col("query_id"))
          .join(norms.as("nc"), col("nc.vec_id") === col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(col("dot").cast("double")
              / (sqrt(col("nq.nn").cast("double")) * sqrt(col("nc.nn").cast("double"))), 4)
              .as("cos"))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .orderBy("query_id", "rk")
      }
    )
  )
}
