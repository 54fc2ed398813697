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

  /** Blank out the interior of every single-quoted SQL literal (length-
    * preserving, so indices into the masked copy line up with the
    * original). A constant containing `(`, `)`, `OVER`, `ORDER BY` or
    * `SUM(` must be OPAQUE to the scanners below — without masking it
    * corrupts their depth/keyword tracking (ADVICE r12). `''` doubling
    * stays inside the literal. */
  def maskLiterals(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < out.length) {
      if (out(i) == '\'') {
        var j = i + 1
        var open = true
        while (j < out.length && open) {
          if (out(j) == '\'') {
            if (j + 1 < out.length && out(j + 1) == '\'') { out(j) = 'x'; out(j + 1) = 'x'; j += 2 }
            else open = false
          } else { out(j) = 'x'; j += 1 }
        }
        i = j + 1
      } else i += 1
    }
    new String(out)
  }

  /** Every `OVER ( … )` window spec in `sql` that ORDERs without
    * PARTITIONing — the unpartitioned-global-window shape. Balanced-paren
    * scan so `ORDER BY (a + b)` and frame clauses stay inside the body. */
  def globalWindows(sql: String): Seq[String] = {
    // normalize whitespace FIRST: the oracles are multi-line triple-quoted
    // strings, so "ORDER\n          BY" must still match (and a line-split
    // "PARTITION BY" must still count as partitioned)
    val norm = sql.replaceAll("\\s+", " ")
    val up = maskLiterals(norm.toUpperCase)
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
    // string literals are opaque (ADVICE r12): a constant spelling
    // "OVER (ORDER BY" must not trip the scanner, and an unbalanced
    // paren inside a literal must not desync a REAL violation after it
    assert(globalWindows(
      "SELECT 'OVER (ORDER BY x)' AS k FROM t ORDER BY k").isEmpty)
    assert(globalWindows(
      "SELECT replace(a, '(', ''), ROW_NUMBER() OVER (ORDER BY x) FROM t").nonEmpty)
    assert(globalWindows(
      "SELECT 'it''s' AS k, SUM(v) OVER (PARTITION BY g ORDER BY x) FROM t").isEmpty)
  }

  /** Bare (un-CAST) `SUM(` in a query's FINAL projection — the round-11
    * integer-widening hash-fail class: DuckDB types SUM(BIGINT) as
    * HUGEINT, and the driver's dataframe-fetch renders HUGEINT as
    * float64 (`57.0` vs Spark's `57`), so the hash diverges even when
    * every value matches. SUM over decimals is rendering-safe today, but
    * distinguishing operand types statically is impossible — so the rule
    * is uniform: in a final projection, every SUM must sit inside an
    * explicit CAST that pins the DuckDB output type (BIGINT for integer
    * sums; the matching DECIMAL for decimal sums, where it is a no-op).
    * CTE-interior SUMs are exempt (their type is consumed, not emitted);
    * a CTE HUGEINT *flowing* to the final projection is caught by the
    * runtime type gate in tools/oracle_check.py (widened_int_cols). */
  def finalProjectionBareSums(sql: String): Seq[String] = {
    val s = sql.replaceAll("\\s+", " ").trim
    val up = maskLiterals(s.toUpperCase)
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    // last top-level SELECT
    var depth = 0; var lastSel = -1; var i = 0
    while (i < up.length) {
      up(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("SELECT", i) &&
              (i == 0 || !isWord(up(i - 1)))) lastSel = i
      }
      i += 1
    }
    if (lastSel < 0) return Seq.empty
    // first top-level FROM after it bounds the projection
    depth = 0; i = lastSel + 6; var fromAt = up.length
    while (i < up.length && fromAt == up.length) {
      up(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("FROM", i) && !isWord(up(i - 1)) &&
              (i + 4 >= up.length || !isWord(up(i + 4)))) fromAt = i
      }
      i += 1
    }
    val proj = s.substring(lastSel + 6, fromAt)
    val pup = maskLiterals(proj.toUpperCase)
    // CAST(...) spans within the projection (balanced-paren)
    val castSpans = Seq.newBuilder[(Int, Int)]
    var c = pup.indexOf("CAST")
    while (c >= 0) {
      val wordOk = c == 0 || !isWord(pup(c - 1))
      var j = c + 4
      while (j < pup.length && pup(j).isWhitespace) j += 1
      if (wordOk && j < pup.length && pup(j) == '(') {
        var d = 1; var k = j + 1
        while (k < pup.length && d > 0) {
          if (pup(k) == '(') d += 1 else if (pup(k) == ')') d -= 1
          k += 1
        }
        castSpans += ((c, k))
      }
      c = pup.indexOf("CAST", c + 4)
    }
    val spans = castSpans.result()
    val out = Seq.newBuilder[String]
    var m = pup.indexOf("SUM")
    while (m >= 0) {
      val wordOk = (m == 0 || !isWord(pup(m - 1))) &&
        (m + 3 >= pup.length || !isWord(pup(m + 3)))
      var j = m + 3
      while (j < pup.length && pup(j).isWhitespace) j += 1
      val isCall = wordOk && j < pup.length && pup(j) == '('
      if (isCall && !spans.exists { case (a, b) => a <= m && m < b })
        out += proj.substring(m, math.min(proj.length, m + 60))
      m = pup.indexOf("SUM", m + 3)
    }
    out.result()
  }

  test("the bare-SUM checker catches a synthetic violation (and passes compliant shapes)") {
    // bare SUM in a final projection: the violation
    assert(finalProjectionBareSums(
      "SELECT k, SUM(v) AS s FROM t GROUP BY 1 ORDER BY 1").nonEmpty)
    // CTE-interior SUM with a cast-free final projection: exempt
    assert(finalProjectionBareSums(
      "WITH a AS (SELECT k, SUM(v) AS s FROM t GROUP BY 1) " +
        "SELECT k, s FROM a ORDER BY 1").isEmpty)
    // CAST-wrapped SUM: compliant
    assert(finalProjectionBareSums(
      "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM t GROUP BY 1 ORDER BY 1").isEmpty)
    // CAST wrapping an expression OVER the sum still counts as pinned
    assert(finalProjectionBareSums(
      "SELECT CAST(SUM(a) * 2 AS BIGINT) AS s FROM t").isEmpty)
    // a second, unwrapped SUM next to a wrapped one is still caught
    assert(finalProjectionBareSums(
      "SELECT CAST(SUM(a) AS BIGINT) AS s, SUM(b) AS u FROM t").nonEmpty)
    // multi-line whitespace + lowercase
    assert(finalProjectionBareSums(
      "select k,\n   sum(v) as s\nfrom t group by 1 order by 1").nonEmpty)
    // identifiers containing 'sum' are not calls
    assert(finalProjectionBareSums(
      "SELECT checksum, summary FROM t ORDER BY 1").isEmpty)
    // string literals are opaque (ADVICE r12): 'SUM(' in a constant is
    // not a call, literal parens must not break the CAST-span tracking,
    // and a literal 'FROM' must not truncate the projection scan
    assert(finalProjectionBareSums(
      "SELECT 'SUM(x)' AS k FROM t ORDER BY 1").isEmpty)
    assert(finalProjectionBareSums(
      "SELECT concat('(', CAST(SUM(v) AS BIGINT)) AS s FROM t").isEmpty)
    assert(finalProjectionBareSums(
      "SELECT ' FROM ' AS k, SUM(v) AS s FROM t").nonEmpty)
  }

  test("no oracle SQL carries a bare SUM in its final projection") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (key, sql) => finalProjectionBareSums(sql).map(v => s"$key: $v")
    }
    assert(bad.isEmpty,
      "bare SUM in a final projection (the round-11 HUGEINT driver-" +
        "rendering hash-fail class — wrap in CAST(... AS BIGINT) or the " +
        s"matching DECIMAL):\n${bad.mkString("\n")}")
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
