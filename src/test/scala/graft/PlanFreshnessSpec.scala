package graft

/** PLANS.md cannot silently drift from HEAD: for every key PlanDump
  * renders, re-derive the physical plan NOW and diff its normalized
  * operator tree against the committed artifact. A join-strategy
  * change, a new exchange, or a reshaped pipeline fails here until
  * `sbt "runMain graft.PlanDump"` re-records the artifact; cosmetic
  * id churn (expression/plan ids) is normalized away and does not.
  */
class PlanFreshnessSpec extends SparkSpec {

  private lazy val committed: String = {
    val p = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(p),
      "PLANS.md missing — run sbt \"runMain graft.PlanDump\"")
    java.nio.file.Files.readString(p)
  }

  /** The sf dir PLANS.md was generated at (its header records it) —
    * regenerating at the SAME dir keeps any size-dependent planner
    * decision comparable. */
  private lazy val genSfDir: String = {
    val m = "at sf dir `([^`]+)`".r.findFirstMatchIn(committed)
    assert(m.isDefined, "PLANS.md header lost its generation sf dir")
    m.get.group(1)
  }

  private def committedSection(key: String): String = {
    val start = committed.indexOf(s"\n## $key\n")
    assert(start >= 0, s"PLANS.md has no section for '$key' — re-run PlanDump")
    val body = committed.substring(start)
    val open = body.indexOf("```\n")
    val close = body.indexOf("\n```", open + 4)
    assert(open >= 0 && close > open, s"no plan block under '$key'")
    body.substring(open + 4, close)
  }

  for ((key, _) <- PlanDump.keys)
    test(s"PLANS.md §$key matches the plan at HEAD") {
      val now = PlanDump.treeHeader(PlanDump.planOf(spark, genSfDir, key))
      val recorded = PlanDump.treeHeader(committedSection(key))
      assert(now == recorded,
        s"""PLANS.md is STALE for '$key' — the operator tree changed.
           |Re-record with: sbt "runMain graft.PlanDump"
           |--- committed ---
           |$recorded
           |--- at HEAD ---
           |$now""".stripMargin)
    }
}
