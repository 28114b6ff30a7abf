package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf1 stress-tier generator (round 12): scales the driver's sf0.1 tables
  * 10x by key-shifted cloning, so the heavy oracles can be hash-verified
  * and benched one decade above the driver's bench tier (the reference
  * defines an sf1 gate, `iceberg_scan_generated_data_1.test_slow`).
  *
  * Clone semantics preserve each query's workload SHAPE:
  *  - fact keys shift by copy (orderkey/lineitem.orderkey stay joined;
  *    event and embedding ids stay unique; users get disjoint id ranges
  *    per copy so session/retention structure scales linearly);
  *  - dimension tables stay as-is (joins fan 10x onto the same keys);
  *  - document TEXT gets a per-copy token prefix, so every copy keeps
  *    the original corpus's near-duplicate structure WITHIN itself but
  *    never collides across copies — MinHash/Jaccard candidate-pair
  *    counts scale linearly with sf, the way a real grown corpus would
  *    (a verbatim clone would instead make every doc a 10-way exact
  *    duplicate and blow pair counts up quadratically).
  *
  * Output is one parquet FILE per table (same layout as /root/testdata)
  * so scripts/check.py and the oracle views read it unchanged. */
object GenSf1 {
  private val Shift = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // plain micros timestamps in the output (INT96 is deprecated and the
    // DuckDB oracle views read these files directly)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    // fact tables land as MULTI-file directories named `t.parquet` (the
    // realistic layout — a single 10x file would cap Spark's scan
    // parallelism at sizeBytes/maxPartitionBytes splits while DuckDB
    // parallelizes by row group; both engines read a multi-file dir at
    // full width). Dimension tables stay single files.
    def writeOne(df: DataFrame, table: String, files: Int = 1): Unit = {
      val out = new org.apache.hadoop.fs.Path(s"$dst/$table.parquet")
      val conf = spark.sessionState.newHadoopConf()
      val fs = out.getFileSystem(conf)
      if (files > 1) {
        fs.delete(out, true)
        df.repartition(files).write.mode("overwrite").parquet(out.toString)
      } else {
        val tmp = s"$dst/_tmp_$table"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val tmpPath = new org.apache.hadoop.fs.Path(tmp)
        val part = fs.listStatus(tmpPath).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        fs.delete(out, true)
        require(fs.rename(part, out), s"rename failed for $table")
        fs.delete(tmpPath, true): Unit
      }
      println(s"[gen-sf1] wrote $out ($files file(s))")
    }

    def clones(table: String)(mutate: (DataFrame, Int) => DataFrame): DataFrame = {
      // events ride through Tables.events: the driver's sf0.1 file stores
      // nanos (read as Long under nanosAsLong) — normalize to NTZ micros
      // once so the sf1 file is a plain timestamp both engines read
      val base =
        if (table == "events") Tables.events(spark, src)
        else spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map(k => if (k == 0) base else mutate(base, k))
        .reduce(_ unionByName _)
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      writeOne(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    writeOne(clones("orders")((d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + k * Shift)),
      "orders", files = 8)
    writeOne(clones("lineitem")((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + k * Shift)),
      "lineitem", files = 16)
    writeOne(clones("events")((d, k) => d
      .withColumn("event_id", col("event_id") + k * Shift)
      .withColumn("user_id", col("user_id") + k * Shift)),
      "events", files = 8)
    writeOne(clones("embeddings")((d, k) =>
      d.withColumn("vec_id", col("vec_id") + k * Shift)), "embeddings")
    writeOne(clones("documents") { (d, k) =>
      val t = regexp_replace(col("text"), "([\\p{L}\\p{N}]+)", s"c${k}q$$1")
      d.withColumn("doc_id", col("doc_id") + k * Shift)
        .withColumn("text", t)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents", files = 8)
    spark.stop()
  }
}
