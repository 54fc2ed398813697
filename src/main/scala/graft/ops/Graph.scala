package graft.ops

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as deterministic dataflow: PageRank over the
  * nation adjacency graph (edge u→v iff u≠v share a region). The graph's
  * NODE SET is edge-derived: a nation alone in its region has no
  * same-region peer, hence no edges, and is EXCLUDED from the graph (and
  * the output) rather than carried as a dangling node — a deliberate
  * semantic both engines state identically (the oracle derives nodes
  * from the same self-join), verified by the fuzz corpus's
  * single-nation region. Within the edge-derived graph every node has
  * out-degree ≥ 1, so no dangling-mass term.
  *
  * Everything stays exact integer milli-units: ranks start at 1000, each
  * round is r' = 150 + (850 · Σ_in (r div outdeg)) div 1000 — the two
  * floor divisions are applied identically in both engines, so a 3-round
  * fixed-iteration run is bit-reproducible. The loop rides the shared
  * convergence iterator (graft.Iterate): the integer fixed point makes
  * "no rank changed" an exact early-stop witness (a changeless round
  * proves all later rounds are the identity), so the oracle's 3-round
  * cap and the convergence exit always agree.
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
      // the rank table is node-count-sized (corpus-derived) — NEVER
      // broadcast it: shuffle_hash keeps each round a bounded hash join
      // on src, and with edges bucketed by src (ops/Bucketed pattern)
      // only the 8-byte rank column moves at 100 TB-graph scale. The
      // change metric is a MULTISET-EQUALITY witness over the two
      // checkpointed rank tables: tag next's rows +1 and prev's −1,
      // then one aggregate of (Σtag, Σtag·xxhash64(id, rank)) — both
      // zero iff the row multisets agree on count AND content. Still
      // shape-independent (a row appearing, disappearing, or changing
      // value all move the sums — the "count EVERY difference"
      // contract), but it costs two checkpoint scans feeding ONE
      // aggregate instead of a node-sized full-outer join per round
      // (the join was measured at ~half the key's runtime). The hash
      // sum accumulates in DECIMAL(38,0): under Spark 4's default ANSI
      // mode a signed-64-bit sum would throw ARITHMETIC_OVERFLOW, and
      // 38 digits hold |Σ±h| ≤ n·2^63 exactly up to n ≈ 10^19 rows —
      // far past any node count. A colliding pair of DIFFERENT
      // multisets needs the exact signed hash sums to cancel — the
      // 2^-64 sketch-equality trade every checksum comparison makes.
      val ranks = graft.Iterate.fixpoint(
        outdeg.select(col("src").as("id"), lit(1000L).as("rank")), 3) { rs =>
        edges
          .join(rs.join(outdeg.hint("shuffle_hash"),
              col("id") === col("src"))
            .select(col("id"), expr("rank div outdeg").as("share"))
            .hint("shuffle_hash"),
            col("src") === col("id"))
          .groupBy(col("dst"))
          .agg((lit(150L) + expr("(850 * sum(share)) div 1000")).as("rank"))
          .select(col("dst").as("id"), col("rank"))
      } { (prev, next) =>
        val tag = (df: DataFrame, sgn: Long) =>
          df.select(lit(sgn).as("sgn"),
            xxhash64(col("id"), col("rank")).as("h"))
        // coalesce: sum over an empty union is NULL (two empty tables
        // are equal, not an error)
        val r = tag(next, 1L).unionByName(tag(prev, -1L))
          .agg(coalesce(sum(col("sgn")), lit(0L)),
            coalesce(sum(col("sgn").cast("decimal(38,0)") *
                col("h").cast("decimal(38,0)")),
              lit(0L).cast("decimal(38,0)"))).first()
        if (r.getLong(0) == 0L && r.getDecimal(1).signum == 0) 0L else 1L
      }.df
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

  /** Thresholded supplier co-purchase edges (one row per unordered pair,
    * s1 < s2): suppliers co-occurring in the same order with
    * co-occurrence weight ≥ the corpus mean — the mean threshold adapts
    * to any scale factor and is compared in exact integer ceil-division
    * form (c ≥ ⌈Σc / n_pairs⌉). ONE definition (Spark here,
    * DuckDB in [[copurchaseEdgesSql]]) shared by triangle_count and
    * graph_bfs_levels: a drift in either copy would silently put the two
    * keys on different graphs. The single-row pair-total is the one
    * broadcast (config-sized); everything else shuffles.
    *
    * Materialized once per (application, dir) — the graph-construction
    * pipeline stage both graph keys consume, like the dedup family's
    * candidate pairs: recomputing the O(Σ per-order pairs) self-join per
    * downstream key would misrepresent the pipeline (and its build cost
    * is billed to `stages`, not to whichever key ran first). */
  private[graft] def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Materialize.once(s, s"copurchase_edges|$d") {
      val su = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val pairs = su
        .join(su.select(col("ok").as("ok2"), col("sk").as("sk2")),
          col("ok") === col("ok2") && col("sk") < col("sk2"))
        .groupBy(col("sk").as("s1"), col("sk2").as("s2"))
        .agg(count(lit(1)).as("c"))
      val tot = pairs.agg(count(lit(1)).as("np"), sum(col("c")).as("sc"))
      // mean threshold as ceil-division, NOT the cross-product form
      // c·np ≥ sc: the product overflows Long once np·c passes 2^63
      // (pair count ~1e10 × co-occurrence ~1e9 at extreme scale), while
      // c ≥ ⌈sc/np⌉ = (sc + np - 1) div np is the same exact integer
      // predicate with both operands bounded by sc (≤ Σc, far under
      // 2^62); np ≥ 1 whenever any row reaches the filter
      pairs.crossJoin(broadcast(tot))
        .filter(col("c") >= expr("(sc + np - 1) div np"))
        .select("s1", "s2")
    }

  /** The su/p/tot/edges CTE block matching [[copurchaseEdges]], shared
    * verbatim by the triangle_count and graph_bfs_levels oracles. */
  private val copurchaseEdgesSql: String =
    """su AS (
              SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
            p AS (
              SELECT a.sk AS s1, b.sk AS s2, count(*) AS c
              FROM su a JOIN su b ON a.ok = b.ok AND a.sk < b.sk
              GROUP BY 1, 2),
            tot AS (SELECT count(*) AS np, sum(c) AS sc FROM p),
            edges AS (SELECT s1, s2 FROM p, tot
                      WHERE c >= (sc + np - 1) // np)"""

  /** Per-node triangle counts over the supplier co-purchase graph
    * ([[copurchaseEdges]]).
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
  /** Degree-ordered orientation of an undirected (s1, s2) edge frame:
    * each edge points low-degree → high-degree (ties by id) as (u, v).
    * Checkpointed — both the wedge and close joins scan it. Exposed for
    * ScaleProbe's wedge-count accounting. */
  private[graft] def orientedOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("s1").as("node"))
      .union(edges.select(col("s2")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    edges
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
  }

  /** Per-node triangle counts over any undirected (s1, s2) edge frame —
    * the SHIPPED triangle pipeline, parameterized over its edge source so
    * the spec (co-purchase graph) and ScaleProbe's replication curve run
    * the identical plan. */
  private[graft] def triangleCountOf(edges: DataFrame): DataFrame = {
    val oriented = orientedOf(edges)
    // Bloom-prune the wedge stream BEFORE the close join's exchange
    // (guide §3.2, the bloom_prune_join machinery): the wedge join emits
    // O(|E|^1.5) candidate (u,v,w) rows but only wedges whose (u,w) is
    // itself an edge close a triangle — on real graphs a small fraction.
    // A Bloom filter over the |E| oriented edge keys (xxhash64(u,v),
    // 3% fpp ≈ 7.3 bits/edge) filters the wedge stream map-side, so the
    // close join's shuffle carries ~triangles + 3% of wedges instead of
    // every wedge (measured at sf0.1: 268 MB → 8 MB shuffle read for
    // the key). False positives only pass extra rows to the exact
    // equi-join — the result is unchanged. The filter is edge-sized
    // (O(|E|) bits vs the O(|E|^1.5) wedge shuffle it replaces); at
    // scales where one broadcast bitmap is too big, the same prune
    // shards by hash range. The count feeding expectedNumItems is the
    // sanctioned scalar feedback over the checkpointed edge table.
    val nEdges = oriented.count()
    val bf = oriented.select(xxhash64(col("u"), col("v")).as("k"))
      .stat.bloomFilter("k", math.max(nEdges, 1L), 0.03)
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.bridge
    val mightClose = bridge.column(BloomFilterMightContain(
      Literal(bfBytes, org.apache.spark.sql.types.BinaryType),
      bridge.expression(xxhash64(col("u"), col("w")))))
    // wedge + close joins hinted shuffle_hash: both sides are
    // corpus-derived (never broadcast), and hashing beats sorting the
    // wedge stream
    val tri = oriented
      .join(oriented.select(col("u").as("v"), col("v").as("w"))
        .hint("shuffle_hash"), "v")
      .filter(mightClose)
      .join(oriented.select(col("u"), col("v").as("w"), lit(1).as("hit"))
        .hint("shuffle_hash"), Seq("u", "w"))
      .select(col("u").as("a"), col("v").as("b"), col("w").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("triangle_cnt"))
      .orderBy("s_suppkey")
  }

  val triangleCount = QuerySpec(
    "triangle_count",
    (s, d) => triangleCountOf(copurchaseEdges(s, d)),
    Some(s"""WITH $copurchaseEdgesSql,
            deg AS (
              SELECT node, count(*) AS dg FROM (
                SELECT s1 AS node FROM edges
                UNION ALL SELECT s2 FROM edges)
              GROUP BY 1),
            o AS MATERIALIZED (
              SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND s1 < s2)
                          THEN s1 ELSE s2 END AS u,
                     CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND s1 < s2)
                          THEN s2 ELSE s1 END AS v
              FROM edges
              JOIN deg da ON da.node = s1
              JOIN deg db ON db.node = s2),
            -- wedge CTE forced MATERIALIZED: left free, DuckDB's
            -- optimizer may close triangles BEFORE enumerating wedges
            -- (join e1⋈e3 on the shared low endpoint first), which is
            -- the unoriented Σdeg² blowup the orientation exists to
            -- avoid — measured 100+ CPU-min vs ~20 s staged on the 5×
            -- corpus (1.07M edges, 152M wedges). Materializing pins
            -- wedge-then-close, the same order the Spark plan ships.
            w AS MATERIALIZED (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM o e1
              JOIN o e2 ON e2.u = e1.v),
            tri AS (
              SELECT a, b, c
              FROM w JOIN o e3 ON e3.u = w.a AND e3.v = w.c),
            x AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
            SELECT node AS s_suppkey, count(*) AS triangle_cnt
            FROM x GROUP BY 1 ORDER BY s_suppkey""")
  )

  /** Recursive-hierarchy analytics — the `WITH RECURSIVE` capability
    * class, Spark-native: over the customer tree encoded in keys
    * (parent = key div 10; keys < 10 are roots), compute each node's
    * root and depth by POINTER DOUBLING — 4 rounds of self-join double
    * the known-ancestor distance 1→2→4→8→16, so a depth-D hierarchy
    * resolves in O(log D) bounded-size joins instead of D dependent
    * scans (the iterative-dataflow answer to recursive CTEs; eager
    * per-round checkpoints exactly as dedup_clusters, else the
    * self-referencing plan tree doubles per round) — plus the classic
    * BOM/org-chart subtree rollup (spend + node count over all
    * descendants, self included) from the exploded ancestor chain.
    *
    * Scale shape: each doubling round is one shuffle-hash self-join on
    * the ancestor key (corpus-derived — never broadcast); the ancestor
    * explode is ≤ log₁₀(maxkey) rows per node map-side, and the rollup
    * is one partial-agg shuffle. The oracle is a genuine recursive CTE,
    * so the two engines reach the same hierarchy by entirely different
    * algorithms. */
  val hierarchyRollup = QuerySpec(
    "hierarchy_rollup",
    (s, d) => {
      val spend = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey").as("k"))
        .agg(coalesce(sum(cents(col("o_totalprice"))), lit(0L))
          .as("spend_cents"))
        .localCheckpoint()
      // ancestor chain from the key encoding: k div 10^j is on the chain
      // while the previous hop was still an internal node (≥ 10).
      // j runs to 18 — the full BIGINT key domain (10^18 is exact in
      // the double pow; a shorter cap would silently drop whole trees
      // once keys pass it, while the unbounded recursive-CTE oracle
      // keeps them)
      val chain = spend.select(col("k"), col("spend_cents"),
          explode(expr(
            """filter(transform(sequence(0, 18),
                 j -> struct(j AS j, k div cast(pow(10, j) AS BIGINT) AS anc)),
               x -> x.j = 0 OR k div cast(pow(10, x.j - 1) AS BIGINT) >= 10)"""))
            .as("a"))
        .select(col("k"), col("spend_cents"), col("a.anc").as("anc"))
      // pointer doubling must run over the ancestor-CLOSED node universe,
      // not the fact keys alone: a sparse key space (fuzz: custkey 910001
      // with no row for 91000) has dangling parents, and a self-join over
      // fact keys only would silently drop those nodes — the recursive
      // CTE oracle never even notices
      // ≤5 rounds: known-ancestor distance doubles 1→2→4→8→16→32,
      // covering the depth-19 worst case of the full BIGINT key domain;
      // the shared convergence iterator exits as soon as every node's
      // tracked ancestor is a root (anc < 10 in this key encoding) —
      // a resolved table is a fixed point (each root self-loops at
      // distance 0), so remaining rounds are provably the identity
      val st = graft.Iterate.fixpoint(
        chain.select(col("anc").as("k")).distinct()
          .select(col("k"),
            when(col("k") >= 10, expr("k div 10")).otherwise(col("k")).as("anc"),
            when(col("k") >= 10, lit(1L)).otherwise(lit(0L)).as("d")), 5) { cur =>
        cur
          .join(cur.select(col("k").as("k2"), col("anc").as("anc2"),
              col("d").as("d2")).hint("shuffle_hash"),
            col("anc") === col("k2"))
          .select(col("k"), col("anc2").as("anc"), (col("d") + col("d2")).as("d"))
      } { (_, next) => next.filter(col("anc") >= 10).count() }.df
      val sub = chain.groupBy("anc")
        .agg(sum(col("spend_cents")).as("subtree_spend_cents"),
          count(lit(1)).as("n_nodes"))
      spend
        .join(st.select(col("k"), col("anc").as("root"), col("d").as("depth")), "k")
        .join(sub.hint("shuffle_hash"), col("k") === col("anc"))
        .select(col("k").as("c_custkey"), col("root"), col("depth"),
          col("spend_cents"), col("subtree_spend_cents"), col("n_nodes"))
        .orderBy("c_custkey")
    },
    Some("""WITH RECURSIVE spend AS (
              SELECT c_custkey AS k,
                     COALESCE(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT), 0) AS spend_cents
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              GROUP BY 1),
            chain(node, anc, d) AS (
              SELECT k, k, 0 FROM spend
              UNION ALL
              SELECT node, anc // 10, d + 1 FROM chain WHERE anc >= 10),
            roots AS (
              SELECT node, anc AS root, CAST(d AS BIGINT) AS depth
              FROM chain WHERE anc < 10),
            sub AS (
              SELECT anc, CAST(SUM(s.spend_cents) AS BIGINT) AS subtree_spend_cents,
                     count(*) AS n_nodes
              FROM chain JOIN spend s ON s.k = chain.node
              GROUP BY anc)
            SELECT s.k AS c_custkey, r.root, r.depth, s.spend_cents,
                   sub.subtree_spend_cents, sub.n_nodes
            FROM spend s
            JOIN roots r ON r.node = s.k
            JOIN sub ON sub.anc = s.k
            ORDER BY c_custkey""")
  )

  /** Subtree rollup over a DATA-DEFINED parent-pointer table — the
    * general form of hierarchyRollup: no key encoding, just an opaque
    * `parent` column (a real org chart / BOM). Input: (k, parent,
    * spend_cents), parent nullable. Semantics: a node whose parent is
    * NULL **or absent from the table** is a root (the manager who left
    * the data); every node reports its root, its depth (hops to root),
    * and the spend/count rolled up over its whole subtree (self
    * included).
    *
    * Algorithm: the ancestor CLOSURE is built by pointer doubling over
    * the pointer column itself — seed with (k,k,0) ∪ (k,parent,1), then
    * `rounds` rounds of clo ∪ (clo ⋈ clo) double the covered distance
    * 1→2→4→…→2^rounds, so any depth ≤ 2^rounds resolves in O(log D)
    * bounded self-joins — run through the shared convergence iterator,
    * which exits the round after the closure stops growing, so callers'
    * `rounds` is a CAP from their provable depth bound, not a spend
    * (each executed round is a full re-distinct of the closure, not
    * free — the early exit is what makes a generous cap safe). Tree-ness
    * makes
    * (k, anc) determine d, so the per-round distinct is exact dedup,
    * not a choice.
    *
    * Scale shape: every join is shuffle_hash on corpus-derived tables
    * (never broadcast); closure size is Σdepth(node) — the same rows any
    * subtree rollup must aggregate — and each round checkpoints so the
    * plan tree stays linear. */
  def ptrRollup(nodes0: DataFrame, rounds: Int = 6): DataFrame = {
    // normalize dangling pointers to NULL (absent parent = root): after
    // this, every non-null parent is a real node and doubling can never
    // drop a child of a missing manager
    val nodes = nodes0
      .join(nodes0.select(col("k").as("pk")).hint("shuffle_hash"),
        col("parent") === col("pk"), "left")
      .select(col("k"), col("pk").as("parent"), col("spend_cents"))
      .localCheckpoint()
    // closure by pointer doubling through the shared convergence
    // iterator: union+distinct only ever ADDS (k, anc, d) rows, so the
    // monotone row-count metric is an exact fixed-point witness — the
    // loop exits the round after the closure stops growing, and a
    // converged closure is transitively closed by construction
    val fixed = graft.Iterate.growth(
      nodes.select(col("k"), col("k").as("anc"), lit(0L).as("d"))
        .union(nodes.filter(col("parent").isNotNull)
          .select(col("k"), col("parent").as("anc"), lit(1L).as("d"))),
      rounds) { clo =>
      clo.union(
          clo.join(clo.select(col("k").as("k2"), col("anc").as("anc2"),
              col("d").as("d2")).hint("shuffle_hash"),
            col("anc") === col("k2") && col("d2") > 0)
            .select(col("k"), col("anc2").as("anc"),
              (col("d") + col("d2")).as("d")))
        .distinct()
    }
    val clo = fixed.df
    val rootOf = clo
      .join(nodes.filter(col("parent").isNull)
        .select(col("k").as("anc")).hint("shuffle_hash"), Seq("anc"))
      .select(col("k"), col("anc").as("root"), col("d").as("depth"))
      .localCheckpoint()
    // completeness guard: an under-provisioned round count must FAIL, not
    // silently drop deep nodes from the output and undercount their
    // ancestors' subtrees — every node must have reached a root. A
    // CONVERGED closure is complete by construction (transitively closed,
    // and every chain ends at a NULL-parent root), so the guard only
    // needs to run when the loop hit the round cap while still growing —
    // and then as ONE aggregate job (left-join roots, count vs
    // count(root)), not two driver-blocking counts
    if (!fixed.converged) {
      val g = nodes.select(col("k"))
        .join(rootOf.select(col("k"), col("root")).hint("shuffle_hash"),
          Seq("k"), "left")
        .agg(count(lit(1)).as("n"), count(col("root")).as("nr"))
        .first()
      val (nNodes, nRooted) = (g.getLong(0), g.getLong(1))
      require(nRooted == nNodes,
        s"ptrRollup: $rounds doubling rounds (distance ${1L << rounds}) left " +
          s"${nNodes - nRooted} of $nNodes nodes rootless — the hierarchy is " +
          "deeper than the round count covers; raise `rounds`")
    }
    val sub = clo
      .join(nodes.select(col("k"), col("spend_cents")).hint("shuffle_hash"),
        "k")
      .groupBy("anc")
      .agg(sum(col("spend_cents")).as("subtree_spend_cents"),
        count(lit(1)).as("n_nodes"))
    nodes.select(col("k"), col("spend_cents"))
      .join(rootOf.hint("shuffle_hash"), "k")
      .join(sub.hint("shuffle_hash"), col("k") === col("anc"))
      .select(col("k").as("c_custkey"), col("root"), col("depth"),
        col("spend_cents"), col("subtree_spend_cents"), col("n_nodes"))
      .orderBy("c_custkey")
  }

  /** hierarchy_rollup generalized to data-defined parent pointers: the
    * customer tree here hangs off an arbitrary-looking `parent` COLUMN
    * (md5-hashed, ~1-in-7 nodes are roots, parent ∈ [1, k/2] so the
    * forest is acyclic with depth ≤ log₂(maxkey) by construction — but
    * the ALGORITHM never sees that: ptrRollup reads only the pointer
    * column, unlike hierarchy_rollup's key-encoded ancestor explode).
    * The oracle follows the same pointers with a genuine recursive CTE,
    * so both engines resolve the same forest by entirely different
    * algorithms. */
  val hierarchyRollupPtr = QuerySpec(
    "hierarchy_rollup_ptr",
    (s, d) => {
      val spend = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey").as("k"))
        .agg(coalesce(sum(cents(col("o_totalprice"))), lit(0L))
          .as("spend_cents"))
      val h =
        "cast(conv(substring(md5(concat('tree-v1:', cast(k as string))), 1, 8), 16, 10) as bigint)"
      // k=1 guards the k div 2 = 0 modulus; h%7 sprinkles extra roots so
      // the fixture is a forest, not one tree
      val nodes0 = spend.select(col("k"),
        when(expr(s"k = 1 or $h % 7 = 0"), lit(null).cast("long"))
          .otherwise(expr(s"1 + $h % (k div 2)")).as("parent"),
        col("spend_cents"))
      // parent ≤ k/2 bounds depth at log₂(maxkey), so the doubling
      // round count derives log-log from one cheap scalar feedback:
      // 4 rounds at sf0.1 (15k keys), 6 at 10¹¹ — each saved round is a
      // full closure re-distinct
      val maxK = Option(customer(s, d).agg(max(col("c_custkey"))).first().get(0))
        .map(_.toString.toLong).getOrElse(1L)
      val depthBound = math.max(2, 64 - java.lang.Long.numberOfLeadingZeros(maxK))
      val rounds = 32 - Integer.numberOfLeadingZeros(depthBound - 1)
      ptrRollup(nodes0, rounds)
    },
    Some(s"""WITH RECURSIVE spend AS (
              SELECT c_custkey AS k,
                     COALESCE(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT), 0) AS spend_cents
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              GROUP BY 1),
            hp AS (
              SELECT k, spend_cents,
                     CASE WHEN k = 1 OR (${graft.llm.TextOps.md5Hex32Sql("'tree-v1:' || CAST(k AS VARCHAR)")}) % 7 = 0
                          THEN NULL
                          ELSE 1 + (${graft.llm.TextOps.md5Hex32Sql("'tree-v1:' || CAST(k AS VARCHAR)")}) % (k // 2)
                     END AS parent
              FROM spend),
            nodes AS (
              SELECT a.k, a.spend_cents,
                     CASE WHEN b.k IS NULL THEN NULL ELSE a.parent END AS parent
              FROM hp a LEFT JOIN hp b ON b.k = a.parent),
            chain(node, anc, d) AS (
              SELECT k, k, 0 FROM nodes
              UNION ALL
              SELECT c.node, p.parent, c.d + 1
              FROM chain c JOIN nodes p ON p.k = c.anc
              WHERE p.parent IS NOT NULL),
            roots AS (
              SELECT c.node, c.anc AS root, CAST(c.d AS BIGINT) AS depth
              FROM chain c JOIN nodes r ON r.k = c.anc
              WHERE r.parent IS NULL),
            sub AS (
              SELECT c.anc, CAST(SUM(s.spend_cents) AS BIGINT) AS subtree_spend_cents,
                     count(*) AS n_nodes
              FROM chain c JOIN nodes s ON s.k = c.node
              GROUP BY c.anc)
            SELECT n.k AS c_custkey, r.root, r.depth, n.spend_cents,
                   sub.subtree_spend_cents, sub.n_nodes
            FROM nodes n
            JOIN roots r ON r.node = n.k
            JOIN sub ON sub.anc = n.k
            ORDER BY c_custkey""")
  )

  /** One BFS relaxation round: union dist with (in-neighbor dist + 1),
    * keep min per node. Exposed so PlanSpec can assert the round shape
    * (one shuffle-hash frontier⋈edges join + min-agg, nothing
    * corpus-derived broadcast) directly on the step plan — the loop's
    * final frame is a checkpoint scan, which shows the blocks, not the
    * join. */
  private[graft] def bfsStep(edges: DataFrame)(dist: DataFrame): DataFrame =
    dist.union(
        dist.join(edges.hint("shuffle_hash"), col("node") === col("src"))
          .select(col("dst").cast("long").as("node"),
            (col("d") + lit(1L)).as("d")))
      .groupBy("node").agg(min(col("d")).as("d"))

  /** The BFS frontier loop, over any (src, dst) edge frame and a (node)
    * seed frame — shared by graph_bfs_levels and ScaleProbe's bfs
    * node-count curve: each round is one [[bfsStep]], so after round r
    * every node at true distance ≤ r holds that distance (monotone,
    * exact). Runs through the shared convergence iterator: the reached
    * set only grows and a node's distance is exact the round it first
    * appears, so "no new node" is an exact fixed-point witness — the
    * loop stops the round after the frontier empties instead of
    * paying `rounds` checkpoint materializations on a shallower graph,
    * while `rounds` stays the semantic cap that mirrors the oracle's
    * recursion guard (nodes farther than `rounds` hops are excluded by
    * BOTH engines). */
  private[graft] def bfsFrom(sources: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame =
    graft.Iterate.growth(
      // distinct: growth's count witness requires a duplicate-free seed
      // (a dup row the first min-agg removes would cancel genuine
      // round-1 growth and truncate the loop as a false "converged")
      sources.select(col("node").cast("long").as("node"), lit(0L).as("d"))
        .distinct(),
      rounds)(bfsStep(edges)).df

  /** Multi-source BFS distance labeling over the supplier co-purchase
    * graph ([[copurchaseEdges]], symmetrized) — the reachability /
    * shortest-path capability class: every supplier reachable within 8
    * hops of the seed set (all suppliers of the minimum nation key
    * present — a data-defined frontier, fed via a single-row broadcast
    * rather than a collect) reports its exact hop distance; nodes
    * farther than 8 hops are excluded by BOTH engines (the oracle's
    * recursion guard and the Spark round cap encode the same bound,
    * and the loop exits at its fixed point as soon as the frontier
    * empties — on this graph rounds, not the cap, set the cost).
    *
    * Scale shape: per round ONE shuffle-hash join frontier⋈edges on src
    * + one min-aggregate; the frontier is ≤ node-count rows, edges are
    * corpus-derived and never broadcast. The oracle is a genuine
    * recursive CTE with UNION-dedup on (node, d) states, so the state
    * space stays nodes × 9 instead of enumerating walks. */
  val bfsLevels = QuerySpec(
    "graph_bfs_levels",
    (s, d) => {
      val e0 = copurchaseEdges(s, d)
      // EAGER checkpoint: the 8 frontier rounds each run an action over
      // this loop-invariant table, and a lazy checkpoint is re-planned
      // per action under AQE (the measured clusterLabels lesson) — the
      // symmetrize-union would be rebuilt every round
      val edges = e0
        .union(e0.select(col("s2").as("s1"), col("s1").as("s2")))
        .select(col("s1").as("src"), col("s2").as("dst"))
        .localCheckpoint()
      val minNation = supplier(s, d).agg(min(col("s_nationkey")).as("mn"))
      val sources = supplier(s, d)
        .join(broadcast(minNation), col("s_nationkey") === col("mn"))
        .select(col("s_suppkey").cast("long").as("node"))
      bfsFrom(sources, edges, 8)
        .select(col("node").as("s_suppkey"), col("d").as("dist"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH RECURSIVE $copurchaseEdgesSql,
            bi AS (SELECT s1 AS src, s2 AS dst FROM edges
                   UNION ALL SELECT s2, s1 FROM edges),
            seed AS (
              SELECT CAST(s_suppkey AS BIGINT) AS node FROM supplier
              WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)),
            reach(node, d) AS (
              SELECT node, 0 FROM seed
              UNION
              SELECT CAST(bi.dst AS BIGINT), r.d + 1
              FROM reach r JOIN bi ON bi.src = r.node
              WHERE r.d < 8)
            SELECT node AS s_suppkey, CAST(min(d) AS BIGINT) AS dist
            FROM reach GROUP BY node ORDER BY s_suppkey""")
  )

  val all: Seq[QuerySpec] =
    Seq(pagerank, triangleCount, hierarchyRollup, hierarchyRollupPtr,
      bfsLevels)
}
