package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the driver-facing mains (Bench / Verify /
  * ScaleProbe) so config tweaks land once, not three times. */
object Harness {

  /** Local session at SPARK_GRAFT_CPUS (default 32, the driver's target
    * topology), shuffle partitions matched to cores, UI off. */
  def session(extra: (String, String)*): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Free localCheckpoint blocks between queries — they are not
    * CacheManager-tracked, so they'd otherwise sit in the BlockManager
    * for the rest of the JVM and squeeze later queries' memory. */
  def sweepBlocks(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
