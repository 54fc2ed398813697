package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the driver's target topology (local[32])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // sample BEFORE the session starts: co-tenant load, not our workers
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
      // release this query's localCheckpoint blocks (not CacheManager-
      // tracked, so they'd otherwise sit in the BlockManager for the
      // rest of the JVM and squeeze later queries' memory)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // self-describing run config: the effective master + shuffle
    // partitions remove ambiguity when comparing bench JSONs across
    // environments
    val master = spark.sparkContext.master
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // load averages: before = co-tenant pressure at start (the bench's
    // own workers are not yet running), after = mixed. Identical code
    // measured 48s quiet vs 97s contended — these make a contended
    // measurement self-diagnosing instead of looking like a regression.
    val loadAfter = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","master":"$master","shuffle_partitions":$shuffle,"load_avg_before":$loadBefore,"load_avg":$loadAfter}""")
    spark.stop()
  }
}
