package graft

// Scratch plan dumper for optimization round 20 — NOT COMMITTED.
// Usage: runMain graft.PlanDump20 <suffix> <name1,name2,...>
object PlanDump20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSet
    val executed = args.length > 2 && args(2) == "executed"
    val spark = GraftSessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r20"))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.contains(q._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r20/${name}_$suffix.txt"), txt)
        if (executed) {
          df.write.format("noop").mode("overwrite").save()
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/r20/${name}_${suffix}_executed.txt"),
            df.queryExecution.executedPlan.toString)
        }
        println(s"dumped $name")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
