package graft

/** Plan-audit main: print the formatted physical plan for one query key
  * (or every key) — the ".explain and iterate until it's the plan you'd
  * want" loop, runnable without touching a REPL.
  *
  * Usage: sbt "runMain graft.Explain <sfDir> [key ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq
               else SparkEntry.queries.keys.toSeq.sorted
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries.get(k) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable =>
            println(s"[explain] $k failed: ${e.getMessage}")
          }
        case None => println(s"[explain] unknown key: $k")
      }
      Harness.sweepBlocks(spark)
    }
    spark.stop()
  }
}
