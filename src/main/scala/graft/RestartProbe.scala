package graft

import org.apache.spark.sql.SparkSession

/** Second recovery class (RECOVERY.json proves TASK-attempt recovery
  * inside `Iterate`; this probe covers APPLICATION loss): a mid-run
  * `spark.stop()` + fresh-session restart, the local stand-in for losing
  * the driver or every executor at once.
  *
  * The engine's durability contract is that NO query key depends on
  * surviving JVM or executor state:
  *   - `Materialize.once` artifacts are per-application caches (the key
  *     embeds the applicationId) — a restarted application never reads a
  *     dead application's temp parquet; it REBUILDS the stage from the
  *     source tables, and because every stage is a deterministic function
  *     of those tables, the rebuild is value-identical.
  *   - `localCheckpoint` blocks are single-job scoped: their loss fails
  *     the one job that owns them, and re-running the key rebuilds them
  *     (the reliable-checkpoint mode covers the iterative loops where a
  *     retry must NOT restart from round zero — RecoveryProbe).
  *
  * The probe runs a stage-heavy key subset in session A (signatures,
  * candidate pairs, cc labels, fact_sales all materialize), kills the
  * application MID-RUN (half the keys done), restarts, and re-runs the
  * full list in session B. It asserts (1) session B rebuilt every stage
  * it needed (build counter re-fires — nothing was reused from A), and
  * (2) every key's rows are identical across sessions — the determinism
  * that makes "just re-run it" a correct recovery strategy.
  *
  * Usage: tools/run_main.sh graft.RestartProbe [sfDir] — writes
  * RESTART_RECOVERY.json to the repo root.
  */
object RestartProbe {
  // stage-consuming composite keys: dedup_clusters pulls minhash sigs →
  // candidate pairs → cc labels; dedup_minhash shares the pair stage;
  // winnow_fingerprint and etl_star_build/report keys cover the other
  // Materialize families (winnow_fp, fact_sales)
  private val keys = Seq("dedup_minhash", "dedup_clusters",
    "winnow_fingerprint", "etl_star_build", "sales_summary")

  private def freshSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a fresh context must not adopt the previous one
      .config("spark.driver.allowMultipleContexts", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def rowsOf(s: SparkSession, sfDir: String, key: String): Seq[String] = {
    val out = SparkEntry.queries(key)(s, sfDir)
      .collect().map(_.toString).toSeq.sorted
    Harness.sweepBlocks(s)
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    // ---- session A: run HALF the keys, then kill the application ----
    val a = freshSession()
    val appA = a.sparkContext.applicationId
    Materialize.buildSecs.clear()
    val half = keys.take(keys.size / 2)
    val rowsA = half.map(k => k -> rowsOf(a, sfDir, k)).toMap
    val stagesA = {
      import scala.jdk.CollectionConverters._
      Materialize.buildSecs.keySet.asScala.toSet
    }
    a.stop() // application loss mid-run: remaining keys never ran here

    // ---- session B: restart, resume the FULL key list from the top ----
    val b = freshSession()
    val appB = b.sparkContext.applicationId
    require(appB != appA,
      s"restart produced the same applicationId ($appA) — the probe " +
        "would not exercise the per-application Materialize keying")
    Materialize.buildSecs.clear()
    val rowsB = keys.map(k => k -> rowsOf(b, sfDir, k)).toMap
    val stagesB = {
      import scala.jdk.CollectionConverters._
      Materialize.buildSecs.keySet.asScala.toSet
    }

    // (1) nothing was resumed from the dead application: every stage the
    // half-run built in A was REBUILT in B (per-application keying means
    // B cannot see A's temp parquet)
    val reused = stagesA -- stagesB
    require(reused.isEmpty,
      s"stages built in session A were NOT rebuilt in session B: $reused " +
        "— the restart path silently depended on dead-application state")
    // (2) determinism across the restart: the overlapping keys' rows are
    // identical, so "re-run from the source tables" is a CORRECT recovery
    val diverged = half.filter(k => rowsA(k) != rowsB(k))
    require(diverged.isEmpty,
      s"keys diverged across restart: $diverged — stage rebuild is not " +
        "deterministic and restart-recovery would corrupt results")

    half.foreach(k => println(
      s"[restart] $k rows=${rowsA(k).size} identical_across_restart=true"))
    println(s"[restart] stages rebuilt in session B: " +
      s"${stagesB.toSeq.sorted.mkString(", ")}")

    def jarr(xs: Iterable[String]) =
      xs.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probes = half.map(k =>
      s"""{"key":"$k","rows":${rowsA(k).size},"identical_across_restart":true}""")
      .mkString(",")
    val json =
      s"""{"artifact":"RESTART_RECOVERY","sf_dir":"$sfDir",""" +
        s""""scenario":"run ${half.size}/${keys.size} keys, spark.stop() mid-run (application loss), fresh session resumes the full list",""" +
        s""""app_a":"$appA","app_b":"$appB",""" +
        s""""stages_built_a":${jarr(stagesA)},"stages_rebuilt_b":${jarr(stagesB)},""" +
        s""""stages_reused_from_dead_app":0,""" +
        s""""probes":[$probes],""" +
        s""""contract":"Materialize artifacts are per-application caches (key embeds applicationId) and every stage is a deterministic function of the source tables, so application loss costs exactly one rebuild of the stages the resumed run touches — never correctness; localCheckpoint blocks are single-job scoped and rebuild with the key; iterative loops keep mid-loop durability via the reliable checkpoint mode (RECOVERY.json)"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("RESTART_RECOVERY.json"),
      (json + "\n").getBytes("UTF-8"))
    b.stop()
  }
}
