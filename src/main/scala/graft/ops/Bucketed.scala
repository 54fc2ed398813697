package graft.ops

import graft.QuerySpec
import graft.Tables._
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables — the shuffle-elimination story
  * for the engine's recurring big⋈big joins.
  *
  * Broadcast covers the small-dim case; when BOTH sides are large (fact ⋈
  * fact, orders ⋈ customer at 100 TB) the standard Spark answer is to
  * write both tables bucketed (and sorted) by the join key: every
  * subsequent join on that key reads bucket i against bucket i directly —
  * no exchange, no sort, on every query that touches the pair. The write
  * pays the shuffle once; the warehouse amortizes it across the query
  * surface (the same write-once/read-many economics as
  * `Materialize.once`, upgraded with key clustering).
  *
  * PlanSpec asserts the physical property: the join subtree contains a
  * SortMergeJoin over `Bucketed: true` scans and ZERO shuffle exchanges.
  * (In-partition sorts remain — Spark ≥3.0 doesn't assume bucket files
  * arrive sorted unless the legacy single-file-per-bucket ordering conf
  * is on; the exchange, not the local sort, is the at-scale cost.)
  */
object Bucketed {

  /** Stale-sweep age gate: only unowned bucket-table dirs at least this
    * old are deleted (see the sweep comment in [[tables]]). A shutdown
    * hook removes this JVM's own dirs on clean exit, so anything older
    * than this is a crashed run's leftover, not a live sibling's. */
  private val SWEEP_AGE_MS = 2L * 60 * 60 * 1000

  private val made =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def warehousePath(s: SparkSession): java.nio.file.Path =
    java.nio.file.Paths.get(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath)

  // managed-table dirs are JVM-scoped caches like Materialize artifacts;
  // the in-memory catalog forgets them at exit, so delete the files too
  // (a leftover non-empty dir would fail the next run's CREATE TABLE)
  private def rm(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(dir)) {
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private val cleanup = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  sys.addShutdownHook { cleanup.forEach(rm(_)) }

  // table names whose build is in flight (registered before the first
  // write) — the sweep must treat these as live even though their key
  // is not yet published in `made`
  private val building =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Bucketed (orders, customer) table names for this (application, data
    * dir), written once. Both sides use the SAME bucket count on the join
    * key — mismatched counts still shuffle the smaller side. The
    * pre-write `repartition` on the bucket key aligns task partitioning
    * with bucket assignment so each task emits one file per bucket it
    * owns instead of numBuckets files per task. */
  def tables(s: SparkSession, d: String): (String, String) =
    // computeIfAbsent, NOT get + putIfAbsent: the side effects (stale-dir
    // sweep + saveAsTable(Overwrite)) must run exactly once per key — two
    // racing threads past a null check would both overwrite the same
    // table dirs concurrently and could corrupt the bucketed write.
    // The lambda only READS `made` (the live-set snapshot), so the
    // no-recursive-update rule of computeIfAbsent is respected.
    made.computeIfAbsent(s.sparkContext.applicationId + "|" + d, { key =>
      // table identifiers must be [a-z0-9_]; key carries '|', '-', '/'.
      // md5, not a char sum: a positional hash can't collide on
      // reordered/anagram keys (two data dirs must never share tables)
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val oTbl = s"graft_orders_bkt_$tag"
      val cTbl = s"graft_customer_bkt_$tag"
      // sweep stale dirs from crashed previous runs before creating —
      // but never a dir some OTHER key in this JVM is still serving OR
      // currently building: computeIfAbsent publishes to `made` only
      // after the lambda returns, so a concurrent build for a DIFFERENT
      // key is invisible in `made.values` — `building` registers names
      // BEFORE any write so another key's sweep can't delete them
      // mid-saveAsTable
      import scala.jdk.CollectionConverters._
      building.add(oTbl); building.add(cTbl)
      val live = made.values.asScala.flatMap(t => Seq(t._1, t._2)).toSet ++
        building.asScala
      val wh = warehousePath(s)
      // cross-PROCESS safety (round-14 finding): the tag embeds the
      // applicationId, so a CONCURRENT graft JVM's live tables are never
      // in this JVM's `live` set — an unconditional sweep deleted a
      // running Bench's tables mid-pass when a full Verify ran beside it
      // (FAILED_READ_FILE.FILE_NOT_EXIST on passes 2-3). Age-gate the
      // sweep: only dirs older than SWEEP_AGE_MS are candidates. Crashed
      // leftovers from previous rounds are hours old; any table a live
      // sibling JVM could still be reading is younger than its own
      // session. The gate trades at most one stale dir-pair of disk for
      // eliminating the cross-process delete race.
      val cutoff = System.currentTimeMillis() - SWEEP_AGE_MS
      if (java.nio.file.Files.exists(wh)) {
        val ls = java.nio.file.Files.list(wh)
        try ls.forEach { p =>
          val n = p.getFileName.toString
          if ((n.startsWith("graft_orders_bkt_") ||
               n.startsWith("graft_customer_bkt_")) && !live.contains(n) &&
              java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
            rm(p)
        }
        finally ls.close()
      }
      // on FAILURE the names must leave `building`, or the half-written
      // dirs stay permanently classified as live in this JVM and a retry
      // for the same tag could never sweep its own stale output. On
      // success they deliberately STAY registered: `made` publishes only
      // after computeIfAbsent returns, so removing here would reopen the
      // window where another key's sweep sees the dirs in neither set —
      // the set grows 2 names per successful build, bounded by the keys
      // built in this JVM (which `made` retains anyway)
      try {
        orders(s, d).repartition(8, col("o_custkey"))
          .write.mode(SaveMode.Overwrite)
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(oTbl)
        customer(s, d).repartition(8, col("c_custkey"))
          .write.mode(SaveMode.Overwrite)
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(cTbl)
      } catch { case t: Throwable =>
        building.remove(oTbl); building.remove(cTbl); throw t
      }
      Seq(oTbl, cTbl).foreach(t => cleanup.add(wh.resolve(t)))
      (oTbl, cTbl)
    })

  /** The exchange-free join itself, exposed for the plan assertion:
    * hint("merge") pins SortMergeJoin (the planner would otherwise
    * broadcast the bench-scale customer table and hide the bucketing),
    * and the matching 8=8 buckets make both exchanges unnecessary. */
  def colocatedJoin(s: SparkSession, d: String) = {
    val (oTbl, cTbl) = tables(s, d)
    s.table(oTbl).hint("merge")
      .join(s.table(cTbl), col("o_custkey") === col("c_custkey"))
  }

  val bucketedJoin = QuerySpec(
    "bucketed_join",
    (s, d) =>
      colocatedJoin(s, d)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"),
             count(lit(1)).as("order_cnt"),
             count_distinct(col("o_custkey")).as("n_customers"))
        .orderBy("segment"),
    Some("""SELECT c_mktsegment AS segment,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS order_cnt,
                   COUNT(DISTINCT o_custkey) AS n_customers
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY segment NULLS FIRST""")
  )

  val all: Seq[QuerySpec] = Seq(bucketedJoin)
}
