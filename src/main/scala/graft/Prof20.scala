package graft

// Scratch profiling harness for optimization round 20 — NOT COMMITTED.
// Warm in-process A/B: alternates variants on one session, reports medians.
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object Prof20 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def ab(name: String, reps: Int, variants: (String, () => Unit)*): Unit = {
    // warm every variant once
    variants.foreach { case (_, f) => f() }
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    variants.foreach { case (n, _) => times(n) = Vector.empty }
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) => times(n) = times(n) :+ time(f()) }
    }
    def med(v: Vector[Double]) = v.sorted.apply((v.size - 1) / 2)
    println(s"== $name ==")
    times.foreach { case (n, v) =>
      println(f"  $n%-28s med=${med(v)}%.3f  all=${v.map(x => f"$x%.3f").mkString(",")}")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val what = args.headOption.getOrElse("all")
    val reps = sys.env.getOrElse("PROF_REPS", "7").toInt

    def dec6(e: Column) = call_function("graft_dec", e, lit(6))
    def dsumCast(e: Column) = call_function("graft_dsum", e.cast(DecimalType(18, 6)))
    def dsumFast(e: Column) = call_function("graft_dsum", dec6(e))

    if (what == "all" || what == "money") {
      val l = Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      def q01(ds: Column => Column) = l.groupBy("l_returnflag", "l_linestatus").agg(
        round(ds(col("l_quantity")), 2).cast("double"),
        round(ds(col("l_extendedprice")), 2).cast("double"),
        round(ds(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).cast("double"),
        round(ds(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).cast("double"),
        round(ds(col("l_discount")).cast("double") / count(lit(1)), 6),
        count(lit(1)))
      ab("q01 money pipeline", reps,
        "cast+graft_dsum (r19)" -> (() => noop(q01(dsumCast))),
        "graft_dec+graft_dsum (r20)" -> (() => noop(q01(dsumFast))))
    }

    if (what == "all" || what == "window") {
      val o = Tables.load(spark, sfDir, "orders")
      val w10 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      def q10(run: Column) = o.select(
        col("o_custkey"), col("o_orderkey"),
        round(run, 2).cast("double").as("running_total"),
        rank().over(w10).as("rk"),
        lag(col("o_totalprice"), 1).over(w10).as("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
      val f10 = w10.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ab("q10 running window sum", reps,
        "builtin sum(cast)" -> (() => noop(q10(sum(col("o_totalprice").cast(DecimalType(18, 6))).over(f10)))),
        "builtin sum(graft_dec)" -> (() => noop(q10(sum(dec6(col("o_totalprice"))).over(f10)))),
        "graft_dsum(cast) (r19)" -> (() => noop(q10(dsumCast(col("o_totalprice")).over(f10)))),
        "graft_dsum(graft_dec)" -> (() => noop(q10(dsumFast(col("o_totalprice")).over(f10)))))

      val w28 = Window.partitionBy("o_custkey").orderBy(col("__d"))
        .rangeBetween(-30, Window.currentRow)
      def q28(sumc: Column) = o.withColumn("__d",
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
        .select(col("o_orderkey"),
          count(lit(1)).over(w28).as("cnt_30d"),
          round(sumc, 2).cast("double").as("sum_30d"))
        .orderBy("o_orderkey")
      ab("q28 range frame sum", reps,
        "builtin sum(cast)" -> (() => noop(q28(sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w28)))),
        "builtin sum(graft_dec)" -> (() => noop(q28(sum(dec6(col("o_totalprice"))).over(w28)))),
        "graft_dsum(cast) (r19)" -> (() => noop(q28(dsumCast(col("o_totalprice")).over(w28)))),
        "graft_dsum(graft_dec)" -> (() => noop(q28(dsumFast(col("o_totalprice")).over(w28)))))

      val e = Tables.events(spark, sfDir)
      val we = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, -1)
      def e07(vd: Column, runSum: Column => Column) = {
        val sel = e.select(col("user_id"), col("ts"), col("event_id"), vd.as("vd"))
        sel.select(col("user_id"), col("event_id"),
          col("vd").cast("double").as("v"),
          runSum(col("vd")).as("s"),
          sum((col("vd") * col("vd")).cast(DecimalType(38, 12))).over(we).cast("double").as("ss"),
          count(lit(1)).over(we).as("n"))
      }
      ab("e07 rolling window sums", reps,
        "r19: cast + graft_dsum" -> (() => noop(e07(col("value").cast(DecimalType(18, 6)),
          c => call_function("graft_dsum", c).over(we).cast("double")))),
        "r20: dec6 + graft_dsum" -> (() => noop(e07(dec6(col("value")),
          c => call_function("graft_dsum", c).over(we).cast("double")))),
        "builtin: dec6 + sum" -> (() => noop(e07(dec6(col("value")),
          c => sum(c).over(we).cast("double")))))
    }

    if (what == "all" || what == "d03") {
      val toks = array_distinct(split(trim(col("text")), "\\s+"))
      val tok = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), explode(toks).as("w"))
        .withColumn("v", conv(substring(md5(col("w").cast("binary")), 1, 8), 16, 10).cast("long"))
      def oldForm = {
        val bitSums = (0 until 32).map { j =>
          sum(when(shiftright(col("v"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
        }
        val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        val simhash = (0 until 32)
          .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        agg.select(col("doc_id"), simhash.cast("long").as("simhash")).orderBy("doc_id")
      }
      def packedForm = {
        // 8 packed longs, 4 x 16-bit one-counts per long; per-bit sum
        // s_j = 2*ones_j - n
        val packed = (0 until 8).map { g =>
          sum((0 until 4).map { k =>
            val j = g * 4 + k
            shiftleft(shiftright(col("v"), j).bitwiseAND(1), 16 * k)
          }.reduce(_ + _)).as(s"p$g")
        }
        val agg = tok.groupBy("doc_id").agg(count(lit(1)).as("n"), packed: _*)
        val simhash = (0 until 32).map { j =>
          val g = j / 4; val k = j % 4
          val ones = shiftright(col(s"p$g"), 16 * k).bitwiseAND(0xFFFF)
          when(ones * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        agg.select(col("doc_id"), simhash.cast("long").as("simhash")).orderBy("doc_id")
      }
      def packed32Form = {
        // 16 packed longs, 2 x 32-bit one-counts per long: overflow needs
        // a doc with 2^32 distinct tokens — same practical safety as the
        // old per-bit long sums
        val packed = (0 until 16).map { g =>
          sum((0 until 2).map { k =>
            val j = g * 2 + k
            shiftleft(shiftright(col("v"), j).bitwiseAND(1), 32 * k)
          }.reduce(_ + _)).as(s"p$g")
        }
        val agg = tok.groupBy("doc_id").agg(count(lit(1)).as("n"), packed: _*)
        val simhash = (0 until 32).map { j =>
          val g = j / 2; val k = j % 2
          val ones = shiftright(col(s"p$g"), 32 * k).bitwiseAND(0xFFFFFFFFL)
          when(ones * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        agg.select(col("doc_id"), simhash.cast("long").as("simhash")).orderBy("doc_id")
      }
      // value check
      val a = oldForm.collect().map(_.toSeq).toSeq
      val b = packedForm.collect().map(_.toSeq).toSeq
      val c = packed32Form.collect().map(_.toSeq).toSeq
      println(s"d03 packed == old: ${a == b}, packed32 == old: ${a == c} (${a.size} rows)")
      ab("d03 simhash", reps,
        "32 sums (old)" -> (() => noop(oldForm)),
        "8 packed sums" -> (() => noop(packedForm)),
        "16 packed32 sums" -> (() => noop(packed32Form)))
    }

    if (what == "all" || what == "t07") {
      val docs = Tables.load(spark, sfDir, "documents")
        .withColumn("__t", split(trim(col("text")), "\\s+"))
      def shingles(df: DataFrame) =
        df.filter(size(col("__t")) >= 5)
          .select(col("doc_id"), explode(array_distinct(expr(
            """transform(sequence(1, size(__t) - 4),
                         i -> concat_ws(' ', element_at(__t, i), element_at(__t, i + 1),
                                        element_at(__t, i + 2), element_at(__t, i + 3),
                                        element_at(__t, i + 4)))"""))).as("w5"))
      def withHash(df: DataFrame) = df.withColumn("h",
        conv(substring(md5(col("w5").cast("binary")), 1, 15), 16, 10).cast("long"))
      ab("t07 phases", reps,
        "shingles only (train)" -> (() => noop(shingles(docs.filter(col("doc_id") >= 50)))),
        "shingles+md5 (train)" -> (() => noop(withHash(shingles(docs.filter(col("doc_id") >= 50))))),
        "full t07" -> (() => {
          val evalH = withHash(shingles(docs.filter(col("doc_id") < 50)))
            .select(col("h"), lit(1).as("__hit")).distinct()
          noop(withHash(shingles(docs.filter(col("doc_id") >= 50)))
            .join(broadcast(evalH), Seq("h"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hits"))
            .withColumn("overlap", round(col("n_hits").cast("double") / col("n_shingles"), 6))
            .withColumn("contaminated", when(col("overlap") >= 0.2, 1).otherwise(0))
            .orderBy("doc_id"))
        }))
    }

    if (what == "all" || what == "ib18") {
      val li = Tables.load(spark, sfDir, "lineitem")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val table = java.nio.file.Files
          .createTempDirectory("prof_ib18_").toString + "/t"
        graft.iceberg.IcebergWriter.write(li, table)
        val t1 = System.nanoTime()
        val keys = li.filter(col("l_orderkey") % 7 === 0)
          .select("l_orderkey").distinct()
        graft.iceberg.IcebergWriter.deleteEquality(spark, table, keys)
        val t2 = System.nanoTime()
        noop(graft.iceberg.IcebergScan.scan(spark, table).agg(
          count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("qty")))
        val t3 = System.nanoTime()
        println(f"ib18 run$i: write=${(t1 - t0) / 1e9}%.3f eqdel=${(t2 - t1) / 1e9}%.3f scan=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
      }
    }

    if (what == "all" || what == "ib22") {
      val orders = Tables.load(spark, sfDir, "orders")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val table = java.nio.file.Files
          .createTempDirectory("prof_ib22_").toString + "/t"
        graft.iceberg.IcebergWriter.write(orders, table)
        val t1 = System.nanoTime()
        val hit = orders.filter(col("o_orderkey") % 5 === 0)
        val updates = hit.withColumn("o_custkey", lit(-1L))
        val inserts = hit
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_custkey", lit(-2L))
        graft.iceberg.IcebergWriter.merge(
          spark, table, updates.unionByName(inserts), Seq("o_orderkey"))
        val t2 = System.nanoTime()
        noop(graft.iceberg.IcebergScan.scan(spark, table).agg(
          count(lit(1)).as("cnt"),
          sum(when(col("o_custkey") === -1L, 1L).otherwise(0L)).as("updated"),
          sum(when(col("o_custkey") === -2L, 1L).otherwise(0L)).as("inserted")))
        val t3 = System.nanoTime()
        println(f"ib22 run$i: write=${(t1 - t0) / 1e9}%.3f merge=${(t2 - t1) / 1e9}%.3f scan=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
      }
    }

    if (what == "ib35x") {
      // finer del2 attribution: build the post-del1 state once, then time
      // the pieces of the second delete separately
      val table = {
        val t = java.nio.file.Files.createTempDirectory("prof_ib35x_").toString + "/t"
        graft.iceberg.IcebergWriter.cloneTable(spark, Prof20Base.base(spark, sfDir), t)
        graft.iceberg.IcebergWriter.delete(spark, t, col("l_orderkey") % 5 === 0)
        t
      }
      import graft.iceberg.IcebergScan
      val planDf = IcebergScan.scan(spark, table)
        .filter(col("l_partkey") % 7 === 0)
      planDf.count()
      println("=== MOR scan executed plan ===")
      println(planDf.queryExecution.executedPlan.toString.take(3000))
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        // (a) the matching MOR scan with provenance + filter (del2's read)
        val pos = IcebergScan.scan(spark, table,
            IcebergScan.Options(keepProvenance = true))
          .filter(col("l_partkey") % 7 === 0)
          .select(col("__graft_file"), col("__graft_pos"))
        val cnt = pos.count()
        val t1 = System.nanoTime()
        // (b) plain MOR scan without provenance for comparison
        val cnt2 = IcebergScan.scan(spark, table)
          .filter(col("l_partkey") % 7 === 0).count()
        val t2 = System.nanoTime()
        // (c) plain scan of the base (no DVs) with provenance
        val cnt3 = IcebergScan.scan(spark, Prof20Base.base(spark, sfDir),
            IcebergScan.Options(keepProvenance = true))
          .filter(col("l_partkey") % 7 === 0)
          .select(col("__graft_file"), col("__graft_pos")).count()
        val t3 = System.nanoTime()
        println(f"ib35x run$i: morProvScan=${(t1 - t0) / 1e9}%.3f ($cnt) morScan=${(t2 - t1) / 1e9}%.3f ($cnt2) noDvProvScan=${(t3 - t2) / 1e9}%.3f ($cnt3)")
      }
    }

    if (what == "all" || what == "ib35") {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val table = {
          // replicate lineitemFork without the private cache: write base once
          val t = java.nio.file.Files.createTempDirectory("prof_ib35_").toString + "/t"
          graft.iceberg.IcebergWriter.cloneTable(spark, Prof20Base.base(spark, sfDir), t)
          t
        }
        val t1 = System.nanoTime()
        graft.iceberg.IcebergWriter.delete(spark, table, col("l_orderkey") % 5 === 0)
        val t2 = System.nanoTime()
        graft.iceberg.IcebergWriter.delete(spark, table, col("l_partkey") % 7 === 0)
        val t3 = System.nanoTime()
        noop(graft.iceberg.IcebergScan.scan(spark, table).agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("long").as("qty"),
          sum(col("l_orderkey") * col("l_linenumber")).cast("long").as("key_sum")))
        val t4 = System.nanoTime()
        println(f"ib35 run$i: clone=${(t1 - t0) / 1e9}%.3f del1=${(t2 - t1) / 1e9}%.3f del2=${(t3 - t2) / 1e9}%.3f scan=${(t4 - t3) / 1e9}%.3f total=${(t4 - t0) / 1e9}%.3f")
      }
    }

    spark.stop()
  }
}

object Prof20Base {
  @volatile private var cached: String = null
  def base(spark: SparkSession, sfDir: String): String = synchronized {
    if (cached == null) {
      val t = java.nio.file.Files.createTempDirectory("prof_ib35_base_").toString + "/b"
      graft.iceberg.IcebergWriter.write(
        Tables.load(spark, sfDir, "lineitem"), t, formatVersion = 3)
      cached = t
    }
    cached
  }
}
