package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-robustness rules, enforced in CI. The round-4 flake class —
  * DuckDB intermittently mis-summing PARALLEL evaluation of globally-
  * ordered windows (`OVER (ORDER BY …)` with no PARTITION BY) — was
  * killed by rewriting every such oracle window-free. This spec is the
  * grep-level lock: a future key cannot reintroduce the pattern without
  * failing the build. No Spark session needed — it's a static scan of
  * SparkEntry.oracleSql.
  */
class OracleRulesSpec extends AnyFunSuite {

  /** Every `OVER ( … )` window spec in `sql` that ORDERs without
    * PARTITIONing — the unpartitioned-global-window shape. Balanced-paren
    * scan so `ORDER BY (a + b)` and frame clauses stay inside the body. */
  def globalWindows(sql: String): Seq[String] = {
    // normalize whitespace FIRST: the oracles are multi-line triple-quoted
    // strings, so "ORDER\n          BY" must still match (and a line-split
    // "PARTITION BY" must still count as partitioned)
    val norm = sql.replaceAll("\\s+", " ")
    val up = norm.toUpperCase
    val out = Seq.newBuilder[String]
    var i = up.indexOf("OVER")
    while (i >= 0) {
      val wordStart = i == 0 || !(up(i - 1).isLetterOrDigit || up(i - 1) == '_')
      var j = i + 4
      while (j < up.length && up(j).isWhitespace) j += 1
      if (wordStart && j < up.length && up(j) == '(') {
        var depth = 1
        var k = j + 1
        while (k < up.length && depth > 0) {
          if (up(k) == '(') depth += 1
          else if (up(k) == ')') depth -= 1
          k += 1
        }
        val body = up.substring(j + 1, math.max(j + 1, k - 1))
        if (body.contains("ORDER BY") && !body.contains("PARTITION BY"))
          out += norm.substring(i, k)
      }
      i = up.indexOf("OVER", i + 4)
    }
    out.result()
  }

  test("the checker catches a synthetic violation (and passes compliant windows)") {
    assert(globalWindows(
      "SELECT ROW_NUMBER() OVER (ORDER BY x) FROM t").nonEmpty)
    assert(globalWindows(
      "SELECT SUM(v) OVER (ORDER BY (a + b) ROWS UNBOUNDED PRECEDING) FROM t").nonEmpty)
    assert(globalWindows(
      "SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) FROM t").isEmpty)
    // whitespace variants: a line-split ORDER BY must still be caught and
    // a line-split PARTITION BY must still count as partitioned
    assert(globalWindows(
      "SELECT SUM(v) OVER (ORDER\n          BY k) FROM t").nonEmpty)
    assert(globalWindows(
      "SELECT SUM(v) OVER (PARTITION\n  BY g\n  ORDER BY k) FROM t").isEmpty)
    assert(globalWindows("SELECT recover (x) FROM t ORDER BY x").isEmpty)
    assert(globalWindows("SELECT a FROM t ORDER BY a").isEmpty)
  }

  test("no oracle SQL contains an unpartitioned ordered window") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (key, sql) => globalWindows(sql).map(w => s"$key: $w")
    }
    assert(bad.isEmpty,
      s"unpartitioned ordered windows in oracles (the DuckDB parallel-" +
        s"window flake class — rewrite window-free):\n${bad.mkString("\n")}")
  }
}
