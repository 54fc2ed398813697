package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver's testdata tables (TESTDATA.md) plus shared
  * type-normalization helpers.
  *
  * Determinism conventions (SURVEY.md §7.4) used across all operators:
  *   - money is always `DecimalType(18,2)` (exact, order-independent sums;
  *     doubles would drift between Spark and the DuckDB oracle);
  *   - computed integers are always `LongType` (DuckDB's default integer
  *     width, so result schemas line up);
  *   - every query result ends with a total-order `orderBy`.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS); Spark's parquet reader rejects
    * nanos by default, so read them as raw longs and rebuild a (truncated)
    * microsecond timestamp — the same value DuckDB sees after its own
    * ns→µs handling for `date_trunc`-level work.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val prev = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val raw = t(s, d, "events")
      raw.schema("ts").dataType match {
        case LongType =>
          // integer div, NOT `/`: long./(long) widens to double, whose
          // 256ns ulp at 1.7e18 corrupts ~2% of timestamps by 1µs
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw // future Spark versions may read nanos natively
      }
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  /** Money normalization: exact decimal, 2 fractional digits. */
  val Money: DecimalType = DecimalType(18, 2)
  def money(c: Column): Column = c.cast(Money)

  /** Final-output cast for any decimal aggregate (keeps Spark's widened
    * sum/product precision from leaking into the result schema). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  def asLong(c: Column): Column = c.cast(LongType)
}
