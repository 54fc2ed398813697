package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // sample BEFORE the session starts: co-tenant load, not our workers
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = Harness.session()
    // warm the JVM/codegen/parquet-reader paths so the first measured
    // query isn't charged for session init (it was absorbing ~5s)
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // fixed (sorted) order: per-key timings comparable across rounds, and
    // one-time pipeline materializations land on deterministic keys
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // -1 marks a failed query; a success records its elapsed seconds
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      Harness.sweepBlocks(spark)
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1 sentinels) must not make the run LOOK faster: sum
    // successes only and mark the run as partial
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // self-describing run config + load averages (before = co-tenant
    // pressure, after = mixed with our own workers): identical code
    // measured 48s quiet vs 97s contended — these separate environment
    // contention from plan regressions when comparing rounds
    val master = spark.sparkContext.master
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val loadAfter = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","master":"$master","shuffle_partitions":$shuffle,"failed":$failed,"load_avg_before":$loadBefore,"load_avg":$loadAfter}""")
    spark.stop()
  }
}
