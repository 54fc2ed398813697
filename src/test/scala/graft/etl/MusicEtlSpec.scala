package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The music business unit (Chinook schema) — music-sales.db is absent
  * from the reference repo (SURVEY §7.5.6), so its ETL semantics are
  * pinned with schema-faithful synthetic rows (schemaDB.txt:144-254):
  * invoices ⋈ invoice_items ⋈ customers extraction
  * (loadAnalyticsDB.R:416-433), tracks ⟕ genres products (:322-331),
  * UnitPrice·Quantity revenue (:428), the +offset key disambiguation
  * (:442-443), and the union with the film unit (:259). */
class MusicEtlSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  // schemaDB.txt-shaped miniature Chinook
  private lazy val customers = Seq(
    (1L, "Luis", "Gonçalves", "Brazil", "São Paulo"),
    (2L, "Helena", "Holý", "Norway", "Oslo"))
    .toDF("CustomerId", "FirstName", "LastName", "Country", "City")
  private lazy val invoices = Seq(
    (10L, 1L, "2009-01-01 00:00:00"),
    (11L, 2L, "2009-02-01 00:00:00"))
    .toDF("InvoiceId", "CustomerId", "InvoiceDate")
  private lazy val invoiceItems = Seq(
    (100L, 10L, 1L, 0.99, 2L),  // 1.98
    (101L, 10L, 2L, 1.99, 1L),  // 1.99
    (102L, 11L, 3L, 0.99, 3L))  // 2.97
    .toDF("InvoiceLineId", "InvoiceId", "TrackId", "UnitPrice", "Quantity")
  private lazy val tracks = Seq(
    (1L, "Track A", Some(1L)), (2L, "Track B", Some(2L)),
    (3L, "Track C", None))     // genre-less → left-join null path
    .toDF("TrackId", "Name", "GenreId")
  private lazy val genres = Seq((1L, "Rock"), (2L, "Jazz"))
    .toDF("GenreId", "Name")

  test("music fact extraction: invoices ⋈ items ⋈ customers with UnitPrice·Quantity") {
    val facts = invoices
      .join(invoiceItems, "InvoiceId")
      .join(customers, "CustomerId")
      .select($"InvoiceId", $"CustomerId", $"Country",
        to_date(to_timestamp($"InvoiceDate")).as("d"),
        ($"UnitPrice".cast("decimal(18,2)") * $"Quantity")
          .cast("decimal(18,2)").as("revenue"),
        $"Quantity".as("units_sold"))
    val got = facts.orderBy("InvoiceId", "revenue")
      .collect().map(r => (r.getLong(0), r.getDecimal(4).toPlainString))
    assert(got.toSeq == Seq((10L, "1.98"), (10L, "1.99"), (11L, "2.97")))
    val total = facts.agg(sum($"revenue")).first().getDecimal(0)
    assert(total.toPlainString == "6.94")
  }

  test("music products: tracks ⟕ genres keeps genre-less tracks") {
    val prods = tracks
      .join(genres.withColumnRenamed("Name", "genre"), Seq("GenreId"), "left")
      .select($"TrackId".as("product_id"), $"Name".as("product_name"),
        coalesce($"genre", lit("Unknown")).as("genre"))
    val got = prods.orderBy("product_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq == Seq((1L, "Rock"), (2L, "Jazz"), (3L, "Unknown")))
  }

  test("+10000 music offset keeps both units' keys disjoint after union") {
    val filmIds = spark.read
      .parquet("src/test/resources/filmdb/customer.parquet")
      .select($"customer_id".cast("long").as("id"))
    val musicIds = customers.select(($"CustomerId" + 10000L).as("id"))
    val unioned = filmIds.withColumn("unit", lit("film"))
      .unionByName(musicIds.withColumn("unit", lit("music")))
    assert(unioned.count() == unioned.select("id").distinct().count())
    assert(unioned.filter($"unit" === "music" && $"id" <= 10000L).count() == 0)
  }

  test("conformed dims union across units (customer_type discriminates)") {
    val filmCust = spark.read
      .parquet("src/test/resources/filmdb/customer.parquet")
      .select($"customer_id".cast("long").as("customer_id"),
        $"first_name".as("first_name"), lit("film").as("customer_type"))
    val musicCust = customers.select(
      ($"CustomerId" + 10000L).as("customer_id"),
      $"FirstName".as("first_name"), lit("music").as("customer_type"))
    val dim = filmCust.unionByName(musicCust)
    assert(dim.count() == 601) // 599 film + 2 music
    assert(dim.groupBy("customer_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("film" -> 599L, "music" -> 2L))
  }
}
