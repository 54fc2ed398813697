package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-number tests against the reference's OWN data (SURVEY §5.3):
  * film-sales.db exported to parquet fixtures. Every expected value below
  * is ground truth measured directly from the shipped SQLite database
  * (BASELINE.md "Measured ground truth") — if the engine's re-expression
  * of the ETL queries (loadAnalyticsDB.R:393-433 semantics) is faithful,
  * these exact numbers fall out.
  */
class GoldenFilmSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  private val dir = "src/test/resources/filmdb"
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Qualifying payments: payment_date IS NOT NULL AND amount > 0
    * (loadAnalyticsDB.R:411-412). */
  private def qualifying: DataFrame =
    t("payment").filter($"payment_date".isNotNull && $"amount" > 0)

  test("row counts match the shipped database") {
    assert(t("payment").count() == 16049)
    assert(qualifying.count() == 16025)
    assert(t("rental").count() == 16044)
    assert(t("film").count() == 1000)
    assert(t("customer").count() == 599)
    assert(t("country").count() == 109)
  }

  test("total film revenue is $67,416.51 over qualifying payments") {
    val total = qualifying
      .agg(sum($"amount".cast("decimal(18,2)"))).first().getDecimal(0)
    assert(total.toPlainString == "67416.51")
  }

  test("revenue by year: 2005 $66,902.33 (15,867), 2006 $514.18 (158)") {
    val byYear = qualifying
      .groupBy(year(to_timestamp($"payment_date")).as("y"))
      .agg(sum($"amount".cast("decimal(18,2)")).as("rev"),
           count(lit(1)).as("cnt"))
      .orderBy("y")
      .collect()
      .map(r => (r.getInt(0), r.getDecimal(1).toPlainString, r.getLong(2)))
    assert(byYear.toSeq == Seq(
      (2005, "66902.33", 15867L),
      (2006, "514.18", 158L)))
  }

  test("revenue by quarter: 2005Q2 $14,456.31, 2005Q3 $52,446.02, 2006Q1 $514.18") {
    val byQ = qualifying
      .groupBy(year(to_timestamp($"payment_date")).as("y"),
               quarter(to_timestamp($"payment_date")).as("q"))
      .agg(sum($"amount".cast("decimal(18,2)")).as("rev"))
      .orderBy("y", "q")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).toPlainString))
    assert(byQ.toSeq == Seq(
      (2005, 2, "14456.31"), (2005, 3, "52446.02"), (2006, 1, "514.18")))
  }

  test("dim_date spine spans 2005-04-24 → 2006-03-16 (±30-day buffer)") {
    // the reference buffers the payment+rental span by 30 days each way
    // (loadAnalyticsDB.R:89-90); same rule as StarSchema.dimDate
    val span = qualifying
      .select(to_date(to_timestamp($"payment_date")).as("d"))
      .unionByName(t("rental").select(to_date(to_timestamp($"rental_date")).as("d")))
      .agg(date_sub(min($"d"), 30), date_add(max($"d"), 30))
      .first()
    assert(span.get(0).toString == "2005-04-24" &&
           span.get(1).toString == "2006-03-16")
  }

  test("payment/rental date span is 2005-05-24 → 2006-02-14") {
    val Array(lo, hi) = qualifying
      .select(to_date(to_timestamp($"payment_date")).as("d"))
      .unionByName(t("rental").select(to_date(to_timestamp($"rental_date")).as("d")))
      .agg(min($"d"), max($"d")).first().toSeq.map(_.toString).toArray
    assert(lo == "2005-05-24" && hi == "2006-02-14")
  }

  test("top-3 countries by revenue: India, China, United States") {
    // the full extract join chain (loadAnalyticsDB.R:393-413):
    // payment ⟕ rental ⟕ inventory ⟕ film, customer ⋈ address ⋈ city ⋈ country
    val geo = t("customer")
      .join(t("address"), "address_id")
      .join(t("city"), "city_id")
      .join(t("country"), "country_id")
      .select($"customer_id", $"country")
    val top = qualifying
      .join(geo, Seq("customer_id"))
      .groupBy("country")
      .agg(sum($"amount".cast("decimal(18,2)")).as("rev"))
      .orderBy($"rev".desc, $"country")
      .limit(3)
      .collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString))
    assert(top.toSeq == Seq(
      ("India", "6630.27"), ("China", "5802.73"), ("United States", "4110.32")))
  }

  test("597 distinct film (country, city) locations") {
    val n = t("customer")
      .join(t("address"), "address_id")
      .join(t("city"), "city_id")
      .join(t("country"), "country_id")
      .select($"country", $"city")
      .distinct()
      .count()
    assert(n == 597)
  }

  test("exactly 5 payments hit the COALESCE(film_id, -1) fallback") {
    // payments whose rental→inventory→film chain is unresolvable
    // (loadAnalyticsDB.R:400, 408-410)
    val resolved = qualifying
      .join(t("rental"), Seq("rental_id"), "left")
      .join(t("inventory"), Seq("inventory_id"), "left")
      .select(coalesce($"film_id", lit(-1L)).as("film_key"))
    assert(resolved.filter($"film_key" === -1L).count() == 5)
    assert(resolved.count() == qualifying.count()) // left joins preserve grain
  }
}
