package graft

/** Diagnostic main behind the round-17 bench-action fix: print the
  * OPTIMIZED plan of `df.count()` for the given keys, next to the
  * frame's own optimized plan. Catalyst re-optimizes a count — final
  * projections/sorts are pruned, unreferenced window outputs drop, and
  * a left outer join whose right side is unique on the join key is
  * eliminated — so a count-based bench measures less than the query
  * (delta_dedup.count() collapsed to a filtered scan count). Bench
  * therefore uses Harness.exhaust (the noop v2 sink); this main is the
  * audit tool that found it and the one to re-run when adding a key.
  *
  * Usage: tools/run_main.sh graft.CountPlanProbe <sfDir> key [key ...]
  */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    for (k <- args.drop(1)) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      println(s"\n===== $k count() optimized plan =====")
      println(df.groupBy().count().queryExecution.optimizedPlan
        .toString.take(4000))
      println(s"===== $k own optimized plan (what exhaust executes) =====")
      println(df.queryExecution.optimizedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
