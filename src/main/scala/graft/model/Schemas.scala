package graft.model

import org.apache.spark.sql.types._

/** Declared-schema catalog (SURVEY §7.1 / reference S5).
  *
  * The reference declares its star schema as DDL up front
  * (createStarSchema.R:59-173: dim_date, dim_location, dim_customer,
  * dim_product, fact_sales, sales_summary); the Spark-native equivalent
  * is an explicit `StructType` per table. Parquet carries its own schema,
  * so these earn their keep on the schema-on-read paths — `Io.readCsv` /
  * `Io.readJsonLines` landing zones (never `inferSchema` in production:
  * one pass saved, drift caught at read time instead of mid-query) — and
  * as the single source of truth the ETL builders are asserted against
  * (SchemasSpec: built frame schema == declared schema).
  *
  * Convention (Tables.scala): money lands as integer cents/`BIGINT`
  * (`*_cents`, scale-4 revenue as `*_tenthcents`), computed ints are
  * `LongType`, natural keys are `LongType`.
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  // ---- star schema (createStarSchema.R:59-173) ----

  /** dim_date (createStarSchema.R:61-75). */
  val dimDate: StructType = StructType(Seq(
    f("date_key", LongType),
    f("date", DateType),
    f("year", LongType),
    f("quarter", LongType),
    f("month", LongType),
    f("month_name", StringType),
    f("day", LongType),
    f("week", LongType)))

  /** dim_location (createStarSchema.R:78-90). */
  val dimLocation: StructType = StructType(Seq(
    f("location_key", LongType),
    f("country", StringType),
    f("region", StringType)))

  /** dim_customer (createStarSchema.R:93-109). */
  val dimCustomer: StructType = StructType(Seq(
    f("customer_key", LongType),
    f("customer_name", StringType),
    f("country", StringType),
    f("region", StringType),
    f("segment", StringType),
    f("customer_type", StringType, nullable = false)))

  /** dim_product (createStarSchema.R:112-127). */
  val dimProduct: StructType = StructType(Seq(
    f("product_key", LongType),
    f("product_name", StringType),
    f("product_type", StringType),
    f("category", StringType),
    f("list_price_cents", LongType)))

  /** fact_sales (createStarSchema.R:130-161), with the denormalized
    * year/quarter/month/country the reference indexes (:168-172) — at
    * scale these drive partition pruning instead. */
  val factSales: StructType = StructType(Seq(
    f("order_id", LongType),
    f("line_no", IntegerType), // source grain column, carried as-is

    f("date_key", LongType),
    f("customer_key", LongType),
    f("product_key", LongType),
    f("units_sold_cents", LongType),
    f("revenue_tenthcents", LongType),
    f("year", LongType),
    f("quarter", LongType),
    f("month", LongType),
    f("country", StringType, nullable = false)))

  /** sales_summary (README.md:22 — declared in the reference, created
    * here). */
  val salesSummary: StructType = StructType(Seq(
    f("year", LongType),
    f("quarter", LongType),
    f("country", StringType, nullable = false),
    f("revenue_tenthcents", LongType),
    f("units_cents", LongType),
    f("n_customers", LongType, nullable = false),
    f("txn_cnt", LongType, nullable = false)))

  // ---- raw landing zones (schema-on-read CSV/JSON ingestion) ----

  /** Film-unit payment extract (loadAnalyticsDB.R:393-413 projection):
    * the flat frame the reference pulls from SQLite, as a CSV/JSON
    * landing schema. */
  val filmPayments: StructType = StructType(Seq(
    f("payment_id", LongType),
    f("customer_id", LongType),
    f("film_id", LongType),
    f("amount", DecimalType(18, 2)),
    f("payment_date", TimestampType),
    f("country", StringType),
    f("city", StringType)))

  /** Music-unit invoice-line extract (loadAnalyticsDB.R:416-433,
    * schemaDB.txt:144-254 Chinook shapes). */
  val musicInvoiceLines: StructType = StructType(Seq(
    f("invoice_line_id", LongType),
    f("invoice_id", LongType),
    f("customer_id", LongType),
    f("track_id", LongType),
    f("unit_price", DecimalType(18, 2)),
    f("quantity", LongType),
    f("invoice_date", TimestampType),
    f("country", StringType),
    f("city", StringType)))

  /** Event-stream landing schema (events table shape, TESTDATA.md) —
    * note ts is micros here; the nanos parquet quirk is handled by
    * `Tables.events`, not the landing zone. */
  val events: StructType = StructType(Seq(
    f("event_id", LongType),
    f("ts", TimestampType),
    f("user_id", LongType),
    f("event_type", StringType),
    f("value", DoubleType),
    f("props", StringType)))

  /** Everything the engine declares, by table name — the DDL-catalog
    * surface (S5). */
  val all: Map[String, StructType] = Map(
    "dim_date" -> dimDate,
    "dim_location" -> dimLocation,
    "dim_customer" -> dimCustomer,
    "dim_product" -> dimProduct,
    "fact_sales" -> factSales,
    "sales_summary" -> salesSummary,
    "film_payments" -> filmPayments,
    "music_invoice_lines" -> musicInvoiceLines,
    "events" -> events)
}
