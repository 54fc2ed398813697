package graft.ops

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as deterministic dataflow: PageRank over the
  * nation adjacency graph (edge u→v iff u≠v share a region — every node
  * has out-degree ≥ 1 by construction, so no dangling-mass term).
  *
  * Everything stays exact integer milli-units: ranks start at 1000, each
  * round is r' = 150 + (850 · Σ_in (r div outdeg)) div 1000 — the two
  * floor divisions are applied identically in both engines, so a 3-round
  * fixed-iteration run is bit-reproducible (the production loop runs the
  * same round to convergence with eager checkpoints, the dedup_clusters
  * pattern — see llm/Dedup.scala).
  *
  * Scale shape per round: one shuffle — contributions group by dst; the
  * edge table is hash-partitioned once and reused; ranks are the only
  * thing that moves. At 100 TB-graph scale the edges get bucketed by src
  * so the join is co-located (ops/Bucketed pattern) and only the 8-byte
  * rank column shuffles.
  */
object Graph {

  val pagerank = QuerySpec(
    "graph_pagerank",
    (s, d) => {
      val n = nation(s, d).select(col("n_nationkey").cast("long").as("id"),
        col("n_regionkey").as("r"))
      val edges = n.join(n.select(col("id").as("dst"), col("r")), Seq("r"))
        .filter(col("id") =!= col("dst"))
        .select(col("id").as("src"), col("dst"))
        .localCheckpoint(false)
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      var ranks = outdeg.select(col("src").as("id"), lit(1000L).as("rank"))
      // the rank table is node-count-sized (corpus-derived) — NEVER
      // broadcast it: shuffle_hash keeps each round a bounded hash join
      // on src, and with edges bucketed by src (ops/Bucketed pattern)
      // only the 8-byte rank column moves at 100 TB-graph scale
      for (_ <- 1 to 3)
        ranks = edges
          .join(ranks.join(outdeg.hint("shuffle_hash"),
              col("id") === col("src"))
            .select(col("id"), expr("rank div outdeg").as("share"))
            .hint("shuffle_hash"),
            col("src") === col("id"))
          .groupBy(col("dst"))
          .agg((lit(150L) + expr("(850 * sum(share)) div 1000")).as("rank"))
          .select(col("dst").as("id"), col("rank"))
      ranks.join(outdeg.hint("shuffle_hash"), col("id") === col("src"))
        .select(col("id").as("nation_id"), col("rank").as("rank_milli"),
          col("outdeg"))
        .orderBy("nation_id")
    },
    Some("""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS id, n_regionkey AS r
                       FROM nation),
            edges AS (
              SELECT a.id AS src, b.id AS dst
              FROM n a JOIN n b ON a.r = b.r AND a.id <> b.id),
            outdeg AS (
              SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
            r0 AS (SELECT src AS id, CAST(1000 AS BIGINT) AS rank FROM outdeg),
            r1 AS (
              SELECT dst AS id, 150 + (850 * SUM(share)) // 1000 AS rank
              FROM edges JOIN (SELECT id, rank // outdeg AS share
                               FROM r0 JOIN outdeg ON id = src) c
                ON src = c.id
              GROUP BY dst),
            r2 AS (
              SELECT dst AS id, 150 + (850 * SUM(share)) // 1000 AS rank
              FROM edges JOIN (SELECT id, rank // outdeg AS share
                               FROM r1 JOIN outdeg ON id = src) c
                ON src = c.id
              GROUP BY dst),
            r3 AS (
              SELECT dst AS id, 150 + (850 * SUM(share)) // 1000 AS rank
              FROM edges JOIN (SELECT id, rank // outdeg AS share
                               FROM r2 JOIN outdeg ON id = src) c
                ON src = c.id
              GROUP BY dst)
            SELECT r3.id AS nation_id, CAST(rank AS BIGINT) AS rank_milli,
                   outdeg
            FROM r3 JOIN outdeg ON r3.id = outdeg.src
            ORDER BY nation_id""")
  )

  /** Per-node triangle counts over the supplier co-purchase graph
    * (edge = two suppliers co-occurring in one order with co-occurrence
    * weight ≥ the corpus mean — the mean threshold adapts to any scale
    * factor, compared in exact integer cross-multiplied form
    * c·n_pairs ≥ Σc).
    *
    * The enumeration is the degree-ordered orientation algorithm: each
    * edge points low-degree → high-degree (ties by id), so every
    * triangle a-b-c is found exactly once as oriented wedge
    * (u→v, v→w) closed by (u→w). Orientation bounds each node's
    * out-degree by O(√|E|) on any graph, so the wedge join — the only
    * superlinear step — generates O(|E|^1.5) candidates instead of the
    * unoriented Σdeg² blowup; this is the standard 100 TB triangle
    * shape (one shuffle to pair, one to orient, two equi-joins).
    * The single-row pair-total is the one broadcast (config-sized);
    * degree and edge tables are corpus-derived and stay on
    * shuffle_hash joins. */
  val triangleCount = QuerySpec(
    "triangle_count",
    (s, d) => {
      val su = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val pairs = su
        .join(su.select(col("ok").as("ok2"), col("sk").as("sk2")),
          col("ok") === col("ok2") && col("sk") < col("sk2"))
        .groupBy(col("sk").as("s1"), col("sk2").as("s2"))
        .agg(count(lit(1)).as("c"))
      val tot = pairs.agg(count(lit(1)).as("np"), sum(col("c")).as("sc"))
      val edges = pairs.crossJoin(broadcast(tot))
        .filter(col("c") * col("np") >= col("sc"))
        .select("s1", "s2")
        .localCheckpoint(false)
      val deg = edges.select(col("s1").as("node"))
        .union(edges.select(col("s2")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      val oriented = edges
        .join(deg.select(col("node").as("s1"), col("dg").as("d1"))
          .hint("shuffle_hash"), "s1")
        .join(deg.select(col("node").as("s2"), col("dg").as("d2"))
          .hint("shuffle_hash"), "s2")
        .select(
          when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("s1") < col("s2")),
            col("s1")).otherwise(col("s2")).as("u"),
          when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("s1") < col("s2")),
            col("s2")).otherwise(col("s1")).as("v"))
        .localCheckpoint(false)
      // wedge + close joins hinted shuffle_hash: both sides are
      // corpus-derived (never broadcast), and hashing beats sorting the
      // O(|E|^1.5) wedge stream
      val tri = oriented
        .join(oriented.select(col("u").as("v"), col("v").as("w"))
          .hint("shuffle_hash"), "v")
        .join(oriented.select(col("u"), col("v").as("w"), lit(1).as("hit"))
          .hint("shuffle_hash"), Seq("u", "w"))
        .select(col("u").as("a"), col("v").as("b"), col("w").as("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("triangle_cnt"))
        .orderBy("s_suppkey")
    },
    Some("""WITH su AS (
              SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
            p AS (
              SELECT a.sk AS s1, b.sk AS s2, count(*) AS c
              FROM su a JOIN su b ON a.ok = b.ok AND a.sk < b.sk
              GROUP BY 1, 2),
            tot AS (SELECT count(*) AS np, sum(c) AS sc FROM p),
            edges AS (SELECT s1, s2 FROM p, tot WHERE c * np >= sc),
            deg AS (
              SELECT node, count(*) AS dg FROM (
                SELECT s1 AS node FROM edges
                UNION ALL SELECT s2 FROM edges)
              GROUP BY 1),
            o AS (
              SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND s1 < s2)
                          THEN s1 ELSE s2 END AS u,
                     CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND s1 < s2)
                          THEN s2 ELSE s1 END AS v
              FROM edges
              JOIN deg da ON da.node = s1
              JOIN deg db ON db.node = s2),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM o e1
              JOIN o e2 ON e2.u = e1.v
              JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v),
            x AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
            SELECT node AS s_suppkey, count(*) AS triangle_cnt
            FROM x GROUP BY 1 ORDER BY s_suppkey""")
  )

  val all: Seq[QuerySpec] = Seq(pagerank, triangleCount)
}
