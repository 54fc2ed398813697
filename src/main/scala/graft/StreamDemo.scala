package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Sample-consumer drive of the public streaming API (verification harness).
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // real stream: file source watching a directory; events arrive in two
    // files (ns timestamps → µs)
    import java.nio.file.{Files, Paths, Path}
    val inDir = Files.createTempDirectory("stream_in")
    val stage = Files.createTempDirectory("stream_stage")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    def arrive(name: String, filter: org.apache.spark.sql.Column): Unit = {
      val dir = s"$stage/$name"
      raw.filter(filter).coalesce(1).write.parquet(dir)
      val part = Files.list(Paths.get(dir)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, inDir.resolve(s"$name.parquet"))
    }
    arrive("b0", col("event_id") % 2 === 0)
    val schema = raw.schema
    // same dtype dispatch as Tables.events: nanos-as-long files need the
    // div-1000 rebuild, µs files read as NTZ and only need the zone cast
    val stream0 = s.readStream.schema(schema)
      .option("path", inDir.toString).format("parquet").load()
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        stream0.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream0
    }
    val q = streaming.Events.hourlyByType(stream)
      .writeStream.format("memory").queryName("hourly").outputMode("complete")
      .start()
    q.processAllAvailable()
    println("AFTER_FIRST_FILE_ROWS=" + s.table("hourly").count())
    // second file arrives mid-stream
    arrive("b1", col("event_id") % 2 === 1)
    q.processAllAvailable()
    val streamed = s.table("hourly")
    println("STREAMED_ROWS=" + streamed.count())
    streamed.orderBy("window_start", "event_type").show(6, false)
    // cross-check against the batch path over the same data
    val batch = streaming.Events.hourlyByType(Tables.events(s, d))
    println("BATCH_EQUAL=" + (batch.exceptAll(streamed).count() == 0 &&
      streamed.exceptAll(batch).count() == 0))
    // probe: session windows on the same stream-read data (batch mode)
    val sess = streaming.Events.userSessions(Tables.events(s, d))
    println("SESSIONS=" + sess.count())
    sess.orderBy("user_id", "session_start").show(3, false)
    // stream-stream interval join on the SAME file-source stream, split
    // into click/purchase sides: inner pairs emit as soon as both sides
    // arrive (only outer-join null rows wait for eviction), so the
    // complete-data count must equal the batch run exactly
    val qa = streaming.Events.clickAttribution(
        stream.filter(col("event_type") === "click"),
        stream.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    qa.processAllAvailable()
    val ev = Tables.events(s, d)
    val batchPairs = streaming.Events.clickAttribution(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase")).count()
    val attribPairs = s.table("attrib").count()
    println("ATTRIB_PAIRS=" + attribPairs +
      " ATTRIB_BATCH_EQUAL=" + (attribPairs == batchPairs))
    qa.stop(); q.stop(); s.stop()
  }
}
