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

  val all: Seq[QuerySpec] = Seq(pagerank)
}
