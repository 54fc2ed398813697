package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Write-once/query-many ANN serving probe (VERDICT r12 task 2): at
  * 100 TB the PQ index BUILD is the expensive pass (one full corpus
  * encode) and queries are the steady state — the split must be
  * measured, not implied, and the stored index must answer queries in a
  * FRESH application (no JVM state, no Materialize cache, no lineage)
  * identically to the in-session build.
  *
  * Session A: build the PQ index frames ([[llm.Similarity.pqIndexFramesOf]]),
  * write codebook+codes to parquet (timed: build_sec), record the
  * in-session ann_pq answers, then `spark.stop()` — application loss.
  * Session B: a fresh application reloads ONLY the stored parquet and
  * runs the query batch ([[llm.Similarity.pqQueryFromIndex]], timed:
  * query_sec), and the probe requires row-identity with session A.
  * ANN_INDEX.json records the split plus the compression evidence
  * (stored codes+codebook bytes vs the raw embedding parquet bytes —
  * the "corpus fits in cluster RAM" argument PQ exists for).
  *
  * Usage: tools/run_main.sh graft.AnnIndexProbe [sfDir] — writes
  * ANN_INDEX.json to the repo root.
  */
object AnnIndexProbe {

  private def freshSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def dirBytes(p: String): Long = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(path)) 0L
    else {
      // walk streams hold file handles until closed (ADVICE r13)
      val st = java.nio.file.Files.walk(path)
      try st.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
      finally st.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val idxDir = java.nio.file.Files.createTempDirectory("graft_annidx").toString

    // ---- session A: build + persist the index; in-session reference ----
    val a = freshSession()
    val appA = a.sparkContext.applicationId
    val t0 = System.nanoTime()
    val (cb, cd) = llm.Similarity.pqIndexFramesOf(Tables.embeddings(a, sfDir))
    cb.write.mode("overwrite").parquet(s"$idxDir/codebook")
    cd.write.mode("overwrite").parquet(s"$idxDir/codes")
    val buildSec = (System.nanoTime() - t0) / 1e9
    val ref = llm.Similarity.annPq.fn(a, sfDir).collect()
      .map(_.toString).toSeq
    a.stop() // application loss: session B may reuse nothing from A

    // ---- session B: fresh application, stored index only ----
    val b = freshSession()
    val appB = b.sparkContext.applicationId
    require(appB != appA, s"restart produced the same applicationId $appA")
    val t1 = System.nanoTime()
    val got = llm.Similarity.pqQueryFromIndex(
      Tables.embeddings(b, sfDir).filter(col("vec_id") < 10),
      b.read.parquet(s"$idxDir/codebook"),
      b.read.parquet(s"$idxDir/codes"))
      .collect().map(_.toString).toSeq
    val querySec = (System.nanoTime() - t1) / 1e9
    val identical = got == ref

    val idxBytes = dirBytes(idxDir)
    val rawBytes = dirBytes(s"$sfDir/embeddings.parquet")
    val json =
      s"""{"artifact":"ANN_INDEX","sf":"$sfDir","rows":${got.size},""" +
        s""""build_sec":${math.round(buildSec * 1000) / 1000.0},""" +
        s""""query_sec":${math.round(querySec * 1000) / 1000.0},""" +
        s""""identical_across_restart":$identical,""" +
        s""""app_build":"$appA","app_query":"$appB",""" +
        s""""index_bytes":$idxBytes,"raw_embedding_bytes":$rawBytes,""" +
        s""""note":"session A builds+persists the PQ index and records """ +
        s"""in-session ann_pq answers; spark.stop(); session B (fresh """ +
        s"""application) answers the query batch from the stored """ +
        s"""parquet alone and must match row-for-row"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("ANN_INDEX.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    require(identical,
      s"stored-index answers diverged from in-session ann_pq (${got.size} vs ${ref.size} rows)")
    b.stop()
  }
}
