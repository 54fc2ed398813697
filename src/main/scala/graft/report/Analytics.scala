package graft.report

import graft.Tables._
import graft.QuerySpec
import graft.etl.StarSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's analytics report (BusinessAnalysis.Rmd §3.3) as a
  * library: each Rmd chunk's SQL + R reshaping becomes one DataFrame
  * function over the star-schema fact build. The Rmd's scalar-feedback
  * loops (max_year etc. spliced into later SQL text) become `.first()`
  * reads feeding DataFrame expressions — same dataflow, no string
  * splicing.
  *
  * All queries run off `StarSchema.factSales`, exploiting the
  * denormalized year/quarter/country columns exactly the way the
  * reference's queries skip dimension joins (README.md:130-134).
  */
object Analytics {

  // the reports query the MATERIALIZED fact, exactly like the reference's
  // Rmd queries the loaded fact_sales table (never the extraction join)
  private def fact(s: SparkSession, d: String): DataFrame =
    StarSchema.factSalesMaterialized(s, d)

  /** Rmd:90-106 — revenue by year, top years first. */
  def revenueByYear(s: SparkSession, d: String): DataFrame =
    fact(s, d).groupBy("year")
      .agg(sum(col("revenue_tenthcents")).as("total_revenue_tenthcents"),
           count(lit(1)).as("txn_cnt"))
      .orderBy(col("total_revenue_tenthcents").desc, col("year"))

  /** Rmd:116-140 — per-country revenue pivoted over the 3 most recent
    * years (pivot columns pinned from data via scalar feedback, SURVEY
    * §7.5.5), top-5 countries by total. */
  def revenueByCountryRecentYears(s: SparkSession, d: String): DataFrame = {
    val f = fact(s, d)
    val maxRow = f.agg(max(col("year"))).first()
    val maxYear = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val years = Seq(maxYear - 2, maxYear - 1, maxYear)
    // relative column names (y_minus2..y_latest) so the result schema —
    // and the oracle SQL — stay stable whatever the data's max year is
    val names = Seq("y_minus2", "y_minus1", "y_latest")
    val pivots = years.zip(names).map { case (y, n) =>
      sum(when(col("year") === y, col("revenue_tenthcents")).otherwise(lit(0L)))
        .as(n)
    }
    f.filter(col("year").isin(years: _*))
      .groupBy("country")
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("total", names.map(col).reduce(_ + _))
      .orderBy(col("total").desc, col("country"))
      .limit(5)
  }

  /** Rmd:147-182 — quarterly revenue pivot for the top-5 countries
    * (semi-join against the top-5 derived table), with per-country
    * average-per-transaction. */
  def quarterlyRevenueTop5(s: SparkSession, d: String): DataFrame = {
    // both the top-5 derivation and the main aggregate scan the
    // materialized fact — two column-pruned parquet scans, no
    // checkpoint needed now that the source isn't a join pipeline
    val f = fact(s, d).select("country", "quarter", "revenue_tenthcents")
    val top5 = f.groupBy("country")
      .agg(sum(col("revenue_tenthcents")).as("r"))
      .orderBy(col("r").desc, col("country")).limit(5)
      .select("country")
    def q(n: Int) =
      sum(when(col("quarter") === n, col("revenue_tenthcents")).otherwise(lit(0L)))
        .as(s"q$n")
    f.join(broadcast(top5), Seq("country"), "left_semi")
      .groupBy("country")
      .agg(q(1), q(2), q(3), q(4), count(lit(1)).as("txn_cnt"),
        sum(col("revenue_tenthcents")).as("rev_tenthcents"))
      .withColumn("avg_txn_tenthcents",
        expr("rev_tenthcents div txn_cnt"))
      .drop("rev_tenthcents")
      .orderBy((col("q1") + col("q2") + col("q3") + col("q4")).desc,
               col("country"))
  }

  /** Rmd:186-209 — customer-base summary: distinct customers, countries,
    * revenue per distinct customer. */
  def customerSummary(s: SparkSession, d: String): DataFrame =
    fact(s, d).agg(
      count_distinct(col("customer_key")).as("n_customers"),
      count_distinct(col("country")).as("n_countries"),
      sum(col("revenue_tenthcents")).as("total_revenue_tenthcents"),
      count(lit(1)).as("txn_cnt")) // oracle: reportCustomerSummary

  /** Rmd:409-516 — units by (country, quarter, year) for the top
    * countries, the reference's most reshaped report, as a plain
    * three-key aggregate (the ~80 lines of R pivoting collapse into the
    * rollup_totals / pivot patterns already in ops.Parity). */
  def unitsByCountryQuarter(s: SparkSession, d: String): DataFrame =
    fact(s, d)
      .groupBy("country", "year", "quarter")
      .agg(sum(col("units_sold_cents")).as("units_cents"),
           count(lit(1)).as("txn_cnt"))
      .orderBy("country", "year", "quarter")

  // --- driver-checkable composites over the analytics layer ---

  private val factSql =
    """SELECT l_orderkey, l_linenumber, o_orderdate,
              year(o_orderdate) AS year,
              quarter(o_orderdate) AS quarter,
              CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS units_sold_cents,
              CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   AS DECIMAL(18,4)) * 10000 AS BIGINT) AS revenue_tenthcents,
              COALESCE(n_name, 'UNKNOWN') AS country
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       LEFT JOIN (SELECT c_custkey, n_name FROM customer
                  JOIN nation ON c_nationkey = n_nationkey) c
         ON o_custkey = c.c_custkey
       WHERE l_quantity > 0"""

  val reportRevenueByYear = QuerySpec(
    "report_revenue_by_year",
    (s, d) => revenueByYear(s, d),
    Some(s"""SELECT year,
                    CAST(SUM(revenue_tenthcents) AS BIGINT) AS total_revenue_tenthcents,
                    count(*) AS txn_cnt
             FROM ($factSql) f
             GROUP BY year ORDER BY total_revenue_tenthcents DESC, year""")
  )

  val reportQuarterlyTop5 = QuerySpec(
    "report_quarterly_top5",
    (s, d) => quarterlyRevenueTop5(s, d),
    Some(s"""WITH f AS ($factSql),
             top5 AS (SELECT country FROM f GROUP BY country
                      ORDER BY SUM(revenue_tenthcents) DESC, country LIMIT 5)
             SELECT country,
                    CAST(SUM(CASE WHEN quarter = 1 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS q1,
                    CAST(SUM(CASE WHEN quarter = 2 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS q2,
                    CAST(SUM(CASE WHEN quarter = 3 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS q3,
                    CAST(SUM(CASE WHEN quarter = 4 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS q4,
                    count(*) AS txn_cnt,
                    CAST(SUM(revenue_tenthcents) // count(*) AS BIGINT) AS avg_txn_tenthcents
             FROM f
             WHERE country IN (SELECT country FROM top5)
             GROUP BY country
             ORDER BY (q1 + q2 + q3 + q4) DESC, country""")
  )

  val reportCustomerSummary = QuerySpec(
    "report_customer_summary",
    (s, d) => customerSummary(s, d),
    Some(s"""SELECT (SELECT COUNT(DISTINCT COALESCE(c.c_custkey, -1))
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                     LEFT JOIN (SELECT c_custkey FROM customer) c
                       ON o_custkey = c.c_custkey
                     WHERE l_quantity > 0) AS n_customers,
                    (SELECT COUNT(DISTINCT country) FROM ($factSql) f) AS n_countries,
                    (SELECT CAST(SUM(revenue_tenthcents) AS BIGINT) FROM ($factSql) f2) AS total_revenue_tenthcents,
                    (SELECT count(*) FROM ($factSql) f3) AS txn_cnt""")
  )

  val reportUnitsByCountryQuarter = QuerySpec(
    "report_units_by_country_quarter",
    (s, d) => unitsByCountryQuarter(s, d),
    Some(s"""SELECT country, year, quarter,
                    CAST(SUM(units_sold_cents) AS BIGINT) AS units_cents,
                    count(*) AS txn_cnt
             FROM ($factSql) f
             GROUP BY country, year, quarter
             ORDER BY country, year, quarter""")
  )

  val reportRevenueRecentYears = QuerySpec(
    "report_revenue_recent_years",
    (s, d) => revenueByCountryRecentYears(s, d),
    Some(s"""WITH f AS ($factSql),
             my AS (SELECT MAX(year) AS maxy FROM f),
             p AS (
               SELECT country,
                      CAST(SUM(CASE WHEN year = maxy - 2 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS y_minus2,
                      CAST(SUM(CASE WHEN year = maxy - 1 THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS y_minus1,
                      CAST(SUM(CASE WHEN year = maxy THEN revenue_tenthcents ELSE 0 END) AS BIGINT) AS y_latest
               FROM f, my
               WHERE year >= maxy - 2
               GROUP BY country)
             SELECT country, y_minus2, y_minus1, y_latest,
                    CAST(y_minus2 + y_minus1 + y_latest AS BIGINT) AS total
             FROM p
             ORDER BY total DESC, country LIMIT 5""")
  )

  val all: Seq[QuerySpec] =
    Seq(reportRevenueByYear, reportQuarterlyTop5, reportCustomerSummary,
        reportUnitsByCountryQuarter, reportRevenueRecentYears)
}
