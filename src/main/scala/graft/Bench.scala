package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Benchmark harness: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and emits ONE machine-parseable JSON line.
  *
  * Methodology:
  *  - Each query executes through a `noop` datasource write, which fully
  *    materializes every output column. A bare `.count()` would let
  *    Catalyst prune all projections and measure pure-projection queries
  *    as near-no-ops.
  *  - The JVM is warmed before the first timed query (parquet scan, hash
  *    agg, broadcast join, window, explode — the main codegen shapes), so
  *    the first-timed-query number isn't dominated by ~5 s of one-time
  *    JIT/codegen warmup.
  *  - The JSON line goes to BOTH stdout (unprefixed — see build.sbt
  *    outputStrategy) and bench_result.json next to the repo, so the
  *    driver can parse whichever it captures.
  */
object Bench {

  private def runToNoop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    // Small tables only; exercises scan→filter→agg, broadcast join,
    // window, explode and the noop sink itself.
    val part = Tables.load(spark, sfDir, "part")
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")
    runToNoop(part.filter(col("p_partkey") % 2 === 0)
      .groupBy("p_brand").agg(count(lit(1)), sum(col("p_retailprice"))))
    runToNoop(nation.join(broadcast(region),
      nation("n_regionkey") === region("r_regionkey")))
    runToNoop(part.select(explode(split(col("p_type"), " ")).as("w"))
      .groupBy("w").count())
    runToNoop(nation.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("n_regionkey").orderBy("n_nationkey"))))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runToNoop(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_result.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
