package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Sample-consumer drive of the sources.Io sink/source API (verification).
object IoDemo {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("iodemo-wh").toString)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val out = java.nio.file.Files.createTempDirectory("iodemo").toString

    val fact = etl.StarSchema.factSales(s, d)
    sources.Io.writeFactPartitioned(fact, s"$out/fact")
    println("PART_DIRS=" + new java.io.File(s"$out/fact").list()
      .filter(_.startsWith("year=")).sorted.mkString(","))

    val back = s.read.parquet(s"$out/fact")
    println("ROUNDTRIP_COUNT=" + back.count() + " vs " + fact.count())
    val y = back.select(max(col("year"))).first().get(0).toString
    val pruned = back.filter(col("year") === y)
    pruned.count()
    val scanLine = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("NO-SCAN-LINE")
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(scanLine).getOrElse("NOT-FOUND")
    println("PRUNE=" + pf)
    println("PARTCOUNT=" + pruned.rdd.getNumPartitions)

    // probe: overwrite twice (full-reload idempotency)
    sources.Io.writeDim(etl.StarSchema.dimLocation(s, d), s"$out/dim")
    sources.Io.writeDim(etl.StarSchema.dimLocation(s, d), s"$out/dim")
    println("DIM_IDEMPOTENT=" + (s.read.parquet(s"$out/dim").count() == 25))

    // probe: append sink accumulates
    sources.Io.appendFacts(fact.limit(10), s"$out/app")
    sources.Io.appendFacts(fact.limit(10), s"$out/app")
    println("APPEND_COUNT=" + s.read.parquet(s"$out/app").count())

    // probe: csv reader with a WRONG schema column name → null column,
    // not a crash (schema-on-read discipline)
    fact.limit(5).select("order_id", "country").write
      .option("header", "true").csv(s"$out/csv")
    val wrong = sources.Io.readCsv(s, s"$out/csv",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("order_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("no_such_col", org.apache.spark.sql.types.StringType))))
    println("WRONG_SCHEMA_NULLS=" + wrong.filter(col("no_such_col").isNull).count())

    // scale utilities, live: bucketed co-located join (no shuffle)
    Tables.orders(s, d).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bd")
    Tables.lineitem(s, d).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_bd")
    val bj = s.table("lineitem_bd")
      .join(s.table("orders_bd"), col("l_orderkey") === col("o_orderkey"))
    val bjCnt = bj.count()
    val bjPlan = bj.queryExecution.executedPlan.toString
    println("BUCKET_JOIN_ROWS=" + bjCnt)
    println("BUCKET_JOIN_SHUFFLES=" +
      "Exchange hashpartitioning".r.findAllIn(bjPlan).size)

    // salted join on a synthetic hot key vs plain join
    val big = s.range(0, 100000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(3L)).as("k"),
              col("id").as("v"))
    val smallDim = s.range(0, 7).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val plain = big.join(smallDim, "k").agg(count(lit(1)), sum(col("v"))).first()
    val salted = ops.Scale.saltedJoin(big, smallDim, "k", 16)
      .agg(count(lit(1)), sum(col("v"))).first()
    println("SALTED_EQ_PLAIN=" + (plain == salted) + " " + salted)

    // sketches vs exact
    val o = Tables.orders(s, d)
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val approx = o.select(ops.Scale.approxDistinct(col("o_custkey")))
      .first().getLong(0)
    println(s"APPROX_DISTINCT=$approx EXACT=$exact")
    s.stop()
  }
}
