package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver's testdata tables (TESTDATA.md) plus shared
  * type-normalization helpers.
  *
  * Determinism conventions (SURVEY.md §7.4) used across all operators:
  *   - money is `DecimalType(18,2)` INTERNALLY (exact, order-independent
  *     sums; doubles would drift between Spark and the DuckDB oracle) but
  *     every driver-facing OUTPUT column is integer cents (`BIGINT`):
  *     the driver canonicalizes decimals scale-insensitively on one side
  *     of its compare, so a `DECIMAL(18,2)` value with a trailing zero
  *     (`327221103.20` vs `327221103.2`) hash-mismatches even when the
  *     values are identical. Integers cannot render two ways.
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

  /** Fan a small scan out to all cores before heavy per-row expansion.
    *
    * The testdata files are single-row-group parquet, so Spark cannot
    * split them — every downstream map pipeline (shingle explosion +
    * md5, embedding kernels, JSON parsing) would run on ONE core no
    * matter the `maxPartitionBytes` setting. A round-robin repartition
    * of a few-MB scan costs nothing and parallelizes the expensive
    * generation 32×. Conditional on the scan's partition count: at real
    * scale inputs are many files / many row groups, already split, and
    * this is a no-op (no extra shuffle). */
  private def fanOut(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(s, t(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(s, t(s, d, "embeddings"))

  /** events.parquet carries TIMESTAMP(NANOS); Spark's parquet reader rejects
    * nanos by default, so read them as raw longs and rebuild a (truncated)
    * microsecond timestamp — the same value DuckDB sees after its own
    * ns→µs handling for `date_trunc`-level work.
    *
    * The nanos flag is carried by a CLONED session (not set/unset on the
    * caller's, which would race when two queries build plans
    * concurrently); the clone shares the SparkContext, so the resulting
    * frame composes with frames from the original session.
    */
  // one nanos-enabled clone per source session (clones register listener
  // buses on the shared context — per-call cloning would accumulate them)
  private val nanosSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  def events(s: SparkSession, d: String): DataFrame = {
    val iso = nanosSessions.computeIfAbsent(s, _ =>
      org.apache.spark.sql.graft.bridge.sessionWithConf(
        s, "spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val raw = fanOut(iso, iso.read.parquet(s"$d/events.parquet"))
    raw.schema("ts").dataType match {
      case LongType =>
        // integer div, NOT `/`: long./(long) widens to double, whose
        // 256ns ulp at 1.7e18 corrupts ~2% of timestamps by 1µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        // µs-precision files without timezone annotation read as NTZ,
        // which unix_micros/window functions reject — normalize to the
        // session-zoned type (UTC session ⇒ identical wall times)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Money normalization: exact decimal, 2 fractional digits. */
  val Money: DecimalType = DecimalType(18, 2)
  def money(c: Column): Column = c.cast(Money)

  /** Driver-facing money output: exact integer cents. `c` must already be
    * (or cast exactly to) a scale-2 decimal, so ×100 is integral and the
    * long cast is lossless. Oracle mirror:
    * `CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)`. */
  def cents(c: Column): Column = (c.cast(Money) * 100).cast(LongType)

  /** Scale-4 money output (revenue = price × (1−discount)) as integer
    * 1/10000ths. Oracle mirror: `CAST(... * 10000 AS BIGINT)`. */
  def tenthCents(c: Column): Column =
    (c.cast(DecimalType(18, 4)) * 10000).cast(LongType)

  def asLong(c: Column): Column = c.cast(LongType)
}
