package graft

/** Physical-plan shape assertions: the optimizations the engine relies on
  * at scale must actually appear in the plans Catalyst produces —
  * predicate pushdown to the parquet scan, broadcast joins for dims,
  * TakeOrderedAndProject for top-k, partial aggregation, and
  * whole-stage codegen coverage.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_quantity,30.0)")
      || p.contains("GreaterThan(l_quantity,30"), s"no pushdown in:\n$p")
  }

  test("scan_project prunes columns at the scan (no full-width read)") {
    val p = plan("scan_project")
    assert(p.contains("ReadSchema"), p)
    // only the 4 referenced columns reach the reader
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_extendedprice") && !read.contains("l_tax"), read)
  }

  test("join_chain broadcasts both dimension tables") {
    val p = plan("join_chain")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("topk_orderby_limit plans TakeOrderedAndProject, not a full sort") {
    val p = plan("topk_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("group_sum uses two-phase (partial) hash aggregation") {
    val p = plan("group_sum")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("topk_semi_join plans a broadcast semi join against the top-5 list") {
    val p = plan("topk_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("ngram_jaccard intersects candidates via ShuffledHashJoin (no broadcast of the derived table, no sort of the shingle side)") {
    val df = SparkEntry.queries("ngram_jaccard")(spark, sf)
    df.collect() // finalize AQE so the chosen join strategy is visible
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("sales_summary aggregates the MATERIALIZED fact: no join, pruned scan, partial agg") {
    val df = SparkEntry.queries("sales_summary")(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // the extraction join happened once at materialization time — the
    // pre-aggregate itself is a scan of the fact table, like the
    // reference's sales_summary would be built from loaded fact_sales
    assert(!p.contains("Join"), s"pre-aggregate should not re-join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // column pruning: order_id/line_no/date_key never leave the scan
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("order_id") && !read.contains("date_key"), read)
  }

  test("range_band_join plans a hash equi-join on the bucket, not a nested loop") {
    val df = SparkEntry.queries("range_band_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to a nested loop:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("fact_build keeps the hot path inside whole-stage codegen") {
    // AQE only finalizes (and shows codegen spans) after execution
    val df = SparkEntry.queries("fact_build")(spark, sf)
    df.collect() // finalize this df's own adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    assert(p.contains("*("), p)
  }

  test("bucketed co-located join: SortMergeJoin over bucketed scans with ZERO exchanges") {
    // the entire point of bucketBy(8): bucket i reads against bucket i —
    // the shuffle is paid once at write time, never per query. The
    // in-partition Sorts remain: Spark ≥3.0 won't assume bucket files
    // are sorted (multi-file buckets are the norm at scale; the legacy
    // single-file guarantee is behind
    // spark.sql.legacy.bucketedTableScan.outputOrdering) — and an
    // in-partition sort is cheap; the EXCHANGE is the scale cost.
    val joined = ops.Bucketed.colocatedJoin(spark, sf)
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
    val joinSubtree = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"), s"exchange under the join:\n$p")
  }

  test("salted_skew_join executes as a shuffle hash join on (key, salt)") {
    val df = SparkEntry.queries("salted_skew_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("skew_key") && p.contains("salt"), p)
  }

  test("graph_pagerank never statically broadcasts the rank table") {
    // the rank table is node-count-sized (corpus-derived): the STATIC
    // plan must choose shuffle-hash for every rank join — a broadcast
    // here would OOM the driver at real graph scale. (AQE may still
    // convert at runtime after observing the 25-row bench graph; that
    // size-aware demotion is legitimate, so assert on sparkPlan, the
    // pre-AQE strategy choice.)
    val df = SparkEntry.queries("graph_pagerank")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-derived broadcast in static plan:\n$p")
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("dq_audit scans each audited table exactly once") {
    val df = SparkEntry.queries("dq_audit")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"expected 2 scans (customer, orders), got $scans:\n$p")
  }

  test("stream_enrich broadcasts the dim against the event scan") {
    val p = plan("stream_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dim enrichment degraded to SMJ:\n$p")
  }

  test("bloom_prune_join probes the sketch BEFORE the exact semi-join, in codegen") {
    val df = SparkEntry.queries("bloom_prune_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the membership filter must sit below the semi join in the tree
    // (prune-then-join, not join-then-prune) and be Catalyst's
    // might_contain expression, not a UDF (a UDF would fence the scan
    // stage out of whole-stage codegen)
    val joinIdx = p.indexOf("LeftSemi")
    assert(joinIdx >= 0, p)
    val below = p.substring(joinIdx)
    assert(below.contains("might_contain"),
      s"bloom probe not below the semi join:\n$p")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      s"bloom probe left codegen (UDF node in plan):\n$p")
  }

  test("triangle_count: wedge joins are shuffle-hash, nothing corpus-derived broadcasts") {
    // edges/wedges are corpus-derived — same static rule as pagerank's
    // rank table; hashing also beats sorting the |E|^1.5 wedge stream
    val df = SparkEntry.queries("triangle_count")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert("ShuffledHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-derived broadcast in static plan:\n$p")
  }

  test("ann_pq: ADC is one broadcast join on the query tables + partial top-k") {
    val df = SparkEntry.queries("ann_pq")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    // the one visible join broadcasts the |Q|·m·k distance-table stack
    // (filtered to vec_id < 10); the corpus codes side streams
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("< 10"), s"broadcast side is not the query tables:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // Spark 4 plants a partial WindowGroupLimit: per-partition top-k
    // before the window's shuffle — the at-scale refinement, planned
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("skyline_pareto: the window runs over the price GRID, not raw parts") {
    val df = SparkEntry.queries("skyline_pareto")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the staircase window's input subtree must aggregate (grid collapse)
    // before the single-partition exchange
    val idx = p.indexOf("Window")
    assert(idx >= 0, p)
    assert(p.substring(idx).contains("HashAggregate"),
      s"window not over the collapsed price grid:\n$p")
  }

  test("corpus-derived joins stay shuffle-hash: fuzzy_link variants, collocation unigrams, passage fingerprints") {
    // the pagerank rule, locked for the round-4 keys: vocabulary/variant/
    // fingerprint tables grow with the corpus — the static plan must
    // never pick a broadcast that only fits at bench scale
    // hierarchy_rollup_ptr: the closure and rollup tables are all
    // node-count-sized — same rule
    for (key <- Seq("fuzzy_link", "collocation_pmi", "shared_passage_pairs",
        "hierarchy_rollup_ptr")) {
      val p = SparkEntry.queries(key)(spark, sf).queryExecution.sparkPlan.toString
      assert(p.contains("ShuffledHashJoin"), s"[$key] no shuffle-hash join:\n$p")
      // single-row scalar totals (collocation's n/m) ride BroadcastNestedLoopJoin
      // crosses — equi-join broadcasts are what must not appear
      assert(!p.contains("BroadcastHashJoin"),
        s"[$key] corpus-derived broadcast in static plan:\n$p")
    }
  }

  test("substring_dedup: cross-doc evidence is one windowed gram exchange, no join-back") {
    // r19: the old df-aggregate + join-back pair (two corpus-wide gram
    // shuffles, the second a ShuffledHashJoin) collapsed into ONE
    // hash(h) exchange under a min/max window — the strongest form of
    // the shuffle-hash rule is no join at all; the gram table must
    // still never be broadcast
    val p = SparkEntry.queries("substring_dedup")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"join-back resurrected:\n$p")
    assert(p.contains("Window"), s"windowed cross-doc predicate missing:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"corpus-derived broadcast in static plan:\n$p")
    // exactly two hash exchanges touch gram/position rows: hash(h) for
    // the cross-doc window, hash(doc_id) for gaps-and-islands (the
    // final range exchange is the contracted ORDER BY). Exchanges are
    // inserted by EnsureRequirements, so count on the executed plan.
    val ep = SparkEntry.queries("substring_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(ep).size
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n$ep")
  }

  test("shared_passage_pairs: winnowing runs once (checkpointed), not once per self-join side") {
    val p = SparkEntry.queries("shared_passage_pairs")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Window"),
      s"winnow window recomputed above the checkpoint boundary:\n$p")
  }

  test("two-level prefix-sum keys: no corpus-derived subtree is statically broadcast") {
    // the chunk-offset tables are corpus-DERIVED (config-BOUNDED ≤64k
    // rows by the derived span/band, but still computed from the corpus):
    // the static plan must keep them on shuffle-hash — the chunk
    // partitioning is needed by the intra-chunk window anyway — and only
    // AQE may demote the bounded side to a broadcast after observing its
    // true size. A static broadcast pin here is what the round-4 review
    // flagged: at 10¹¹ docs a FIXED span would make the offsets
    // ~10⁸ rows, and a pinned broadcast() would ship them to every task.
    for (key <- Seq("sequence_pack", "source_interleave", "global_shuffle")) {
      val p = SparkEntry.queries(key)(spark, sf).queryExecution.sparkPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"[$key] corpus-derived broadcast in static plan:\n$p")
      assert(p.contains("ShuffledHashJoin"), s"[$key] no shuffle-hash join:\n$p")
    }
  }

  test("round-10 keys: bounded fan-out stages present, corpus-derived joins stay shuffle-hash") {
    // heavy_hitters: the Space-Saving partials are a MapPartitions stage
    // (bounded per-partition state), the candidate merge joins
    // shuffle-hash, and nothing corpus-derived broadcasts as a hash join
    val hh = SparkEntry.queries("heavy_hitters")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(hh.contains("MapPartitions"), s"no bounded-summary stage:\n$hh")
    assert(!hh.contains("BroadcastHashJoin"), hh)
    assert(hh.contains("ShuffledHashJoin"), hh)
    // basket_affinity: pairs come from Generate off the per-basket
    // aggregate (never a corpus self-join / cartesian), support joins
    // are shuffle-hash
    val ba = SparkEntry.queries("basket_affinity")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(ba.contains("Generate"), s"no per-basket explode:\n$ba")
    assert(!ba.contains("CartesianProduct"), ba)
    assert(!ba.contains("BroadcastHashJoin"), ba)
    assert(ba.contains("ShuffledHashJoin"), ba)
    // knn_graph + bm25_topk: same never-statically-broadcast rule.
    // CAVEAT: a lazily-localCheckpointed subtree physically plans when
    // the frame is BUILT, so assertions on the final plan see only the
    // operators above the pin — which is why knn_graph's bucket join
    // carries its shuffle_hash hint at the source (Similarity.scala),
    // not just here.
    for (key <- Seq("knn_graph", "bm25_topk")) {
      val p = SparkEntry.queries(key)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"[$key] corpus-derived broadcast in static plan:\n$p")
      assert(p.contains("ShuffledHashJoin"), s"[$key] no shuffle-hash:\n$p")
    }
    // weighted_sample + bm25_topk: the top-k cut is TakeOrdered, never a
    // global sort of the corpus
    for (key <- Seq("weighted_sample", "bm25_topk")) {
      val p = plan(key)
      assert(p.contains("TakeOrderedAndProject"), s"[$key] no TakeOrdered:\n$p")
    }
  }

  test("quality_band_filter: thresholds come from the collapsed histogram, bands join back as a broadcast") {
    val df = SparkEntry.queries("quality_band_filter")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the cumulative window must run over the (lang, value) HISTOGRAM —
    // a domain-bounded aggregate — never over per-document rows
    val idx = p.indexOf("Window")
    assert(idx >= 0, p)
    assert(p.substring(idx).contains("HashAggregate"),
      s"window not over the collapsed histogram:\n$p")
    // the band table is domain-bounded (≤ n_langs·1001 rows regardless of
    // corpus size) — the sanctioned config-sized broadcast class
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("vocab_coverage: ONE broadcast (the config-sized vocab) and no corpus-sized join") {
    val df = SparkEntry.queries("vocab_coverage")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // exactly the vocab broadcast: the explode_outer + count shape means
    // there is no per-doc-aggregate join-back for the planner to
    // broadcast (the corpus-derived-broadcast class the repo bans)
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin"),
      s"token-stream join degraded to SMJ:\n$p")
  }

  test("graph_bfs_levels: frontier relaxation is shuffle-hash, nothing corpus-derived broadcasts") {
    // frontier and edge tables are corpus-derived — the pagerank rule.
    // The convergence loop's final frame is a checkpoint scan (blocks,
    // not joins), so the ROUND shape is asserted on the step plan
    // itself over parquet-derived frames
    import org.apache.spark.sql.functions._
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val edges = sup.select(col("s_suppkey").cast("long").as("src"),
      (col("s_suppkey") + 1).cast("long").as("dst"))
    val dist = sup.select(col("s_suppkey").cast("long").as("node"),
      lit(0L).as("d"))
    val p = ops.Graph.bfsStep(edges)(dist).queryExecution.sparkPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-derived broadcast in static plan:\n$p")
    // and the shipped key's final plan keeps the no-broadcast rule
    val kp = SparkEntry.queries("graph_bfs_levels")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!kp.contains("BroadcastHashJoin"), kp)
  }

  test("delta_dedup READS the materialized corpus index — it never rebuilds it") {
    val df = SparkEntry.queries("delta_dedup")(spark, sf)
    df.collect() // finalize AQE; also forces the stage build if first
    // an adaptive plan prints Final AND Initial sections — scan-count
    // assertions must not double-count the same node across the two
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the corpus side enters through the exact-collapse checkpoint
    // (round 17), so the graft_mv scan is no longer visible in the
    // key's own plan — audit the stage directly: the corpus signature
    // input IS the Materialize parquet artifact, not a rebuild
    val stage = llm.Dedup.corpusSigStage(spark, sf)
      .queryExecution.executedPlan.toString
    assert(stage.contains("graft_mv"),
      s"corpus index not served from the materialized artifact:\n$stage")
    // the only documents.parquet scan in the job is the shard keep-list
    // side: one scan, doc_id-only, shard filter pushed down. A corpus
    // index REBUILD would show as a second documents scan reading text
    // below the signature aggregate. (The shard signature build reads
    // text too, but behind its checkpoint boundary — asserted by the
    // ExistingRDD scan — so the visible plan has exactly one.)
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("documents"))
      .toSeq
    assert(docScans.size == 1, s"expected 1 documents scan:\n$p")
    assert(docScans.head.contains("GreaterThanOrEqual(doc_id"),
      s"shard filter not pushed to the scan: ${docScans.head}")
    assert(!docScans.head.contains("text"),
      s"shard keep-list scan reads text: ${docScans.head}")
    assert(p.contains("ExistingRDD"),
      s"shard bands not checkpointed (signature work would run per branch):\n$p")
  }

  test("delta_simhash READS the materialized corpus signature index — it never rebuilds it") {
    // the delta_dedup assertion, applied to the second index family:
    // corpus side off the Materialize artifact, shard signature work
    // behind its checkpoint, and the only documents scan is the
    // doc_id-only shard keep-list with the shard filter pushed down
    val df = SparkEntry.queries("delta_simhash")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("graft_mv"),
      s"corpus index not read from the materialized artifact:\n$p")
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("documents"))
      .toSeq
    assert(docScans.size == 1, s"expected 1 documents scan:\n$p")
    assert(docScans.head.contains("GreaterThanOrEqual(doc_id"),
      s"shard filter not pushed to the scan: ${docScans.head}")
    assert(!docScans.head.contains("text"),
      s"shard keep-list scan reads text: ${docScans.head}")
    assert(p.contains("ExistingRDD"),
      s"shard signatures not checkpointed (signature work would run per branch):\n$p")
  }

  test("sequence_pack: the document-volume window is PARTITIONED (global sort only over chunk totals)") {
    val df = SparkEntry.queries("sequence_pack")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the partitioned intra-chunk window must exist...
    assert(p.contains("Window") &&
      p.contains("windowspecdefinition(chunk"), p)
    // ...and the single-partition exchange must feed only the tiny
    // chunk-totals aggregate, never the per-document rows: the
    // SinglePartition subtree must contain no documents-parquet scan
    // before the next exchange boundary
    val idx = p.indexOf("Exchange SinglePartition")
    assert(idx >= 0, p)
    val after = p.substring(idx)
    val nextExchange = after.indexOf("Exchange hashpartitioning")
    val globalSubtree = if (nextExchange > 0) after.substring(0, nextExchange) else after
    assert(globalSubtree.contains("HashAggregate"),
      s"single-partition window not over the aggregated chunk totals:\n$p")
  }

  test("dsir_weights: profile joins as broadcast (domain-bounded 256 rows), weight agg is partial; totals cross is the only join above the checkpoint") {
    // the weight subtree sits below the key's checkpoint boundary —
    // audit it directly
    val sub = llm.TextOps.dsirWeightOf(Tables.documents(spark, sf))
    val sp = sub.queryExecution.sparkPlan.toString
    assert(sp.contains("BroadcastHashJoin"), s"profile join not broadcast:\n$sp")
    assert("HashAggregate".r.findAllIn(sp).size >= 2, s"no partial agg:\n$sp")
    val p = plan("dsir_weights")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("semdedup_keep: centroid join broadcasts (config-sized); pair + anti joins stay shuffle-hash, member table never broadcast/sorted") {
    val cells = llm.Similarity.semdedupCellsOf(Tables.embeddings(spark, sf))
    val cp = cells.queryExecution.sparkPlan.toString
    assert(cp.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$cp")
    assert(cp.contains("max_by") || cp.contains("maxby"), cp)
    val p = plan("semdedup_keep")
    assert(p.contains("ShuffledHashJoin"), s"pair join not shuffle-hash:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"member table sorted (anti-join degraded to SMJ):\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-derived broadcast above the checkpoint:\n$p")
  }

  test("cdc_chunk_dedup: doc-partitioned lag window, shuffle-hash text join-back, no single-partition exchange, no broadcast") {
    val p = plan("cdc_chunk_dedup")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"chunk-extent window not partitioned by doc_id:\n$p")
    assert(!p.contains("SinglePartition"), s"global exchange:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"text join-back not shuffle-hash:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-derived broadcast:\n$p")
  }

  test("bpe_encode: per-row apply — merge table spliced as literals, ONE documents scan, no join, only the final sort's exchange") {
    val p = plan("bpe_encode")
    // the trained merge table is driver state spliced into the
    // expression tree: nothing corpus-derived rides the plan as a side
    // input, so the apply has NO join of any kind
    assert(!p.contains("Join"), s"tokenizer apply grew a join:\n$p")
    // exactly one corpus scan (the documents table), no re-scan
    assert("Scan parquet".r.findAllIn(p).size == 1, s"plan scans:\n$p")
    // the only exchange is the final ORDER BY's range partitioning —
    // the apply itself is embarrassingly parallel map work
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("SinglePartition"),
      s"per-row apply introduced a shuffle:\n$p")
  }

  test("bpe_sequence_pack: encode pinned below ONE checkpoint; packing keeps the two-level prefix-sum discipline") {
    val p = plan("bpe_sequence_pack")
    // the per-word merge surgery runs once: above the checkpoint the
    // input is the ExistingRDD scan, never a documents parquet re-scan
    assert(p.contains("Scan ExistingRDD"),
      s"encode not checkpoint-pinned:\n$p")
    assert(!p.contains("Scan parquet"),
      s"documents re-scanned above the encode checkpoint:\n$p")
    // two-level rank: corpus window PARTITIONED by chunk, global window
    // only over the bounded chunk-totals aggregate (sequence_pack rule)
    assert(p.contains("windowspecdefinition(chunk"), p)
    val idx = p.indexOf("Exchange SinglePartition")
    assert(idx >= 0, p)
    val after = p.substring(idx)
    val nextExchange = after.indexOf("Exchange hashpartitioning")
    val globalSubtree =
      if (nextExchange > 0) after.substring(0, nextExchange) else after
    assert(globalSubtree.contains("HashAggregate"),
      s"single-partition window not over the aggregated chunk totals:\n$p")
  }

  test("ann_index_persist: steady state reads the STORED index; raw embeddings scanned only for the query vectors") {
    val df = SparkEntry.queries("ann_index_persist")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the stored codebook+codes parquet (Materialize artifact) is the
    // plan's corpus-sized input...
    assert(p.contains("graft_mv"), s"no stored-index scan in:\n$p")
    // ...and the raw embeddings table contributes ONLY query vectors:
    // the embeddings scan carries the vec_id<10 pushdown
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("LessThan(vec_id,10)")),
      s"query-vector pushdown missing:\n$p")
    // the query distance tables join as broadcast; the stored codes
    // side is never sorted or broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"codes scan degraded to SMJ:\n$p")
  }

  test("embedding_quantize: pure per-row map — one scan, no join, no aggregate exchange") {
    val p = plan("embedding_quantize")
    assert(!p.contains("Join"), s"per-row quantizer grew a join:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"plan scans:\n$p")
    // no hash-partitioned shuffle (the only exchanges are the
    // small-file fan-out round-robin and the final sort's range
    // partitioning) and no single-partition collapse
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("SinglePartition"),
      s"per-row quantizer introduced a shuffle:\n$p")
  }

  test("packing_efficiency: checkpoint-pinned counts feed three legs; no corpus-wide single-partition window") {
    val p = plan("packing_efficiency")
    // the token-count frame is pinned: every leg reads the ExistingRDD,
    // never a documents parquet re-scan
    assert(p.contains("Scan ExistingRDD"), s"counts not pinned:\n$p")
    assert(!p.contains("Scan parquet"),
      s"documents re-scanned above the counts checkpoint:\n$p")
    // two-level rank discipline in both batching legs: every
    // SinglePartition exchange sits over an aggregated (bounded) frame
    assert(p.contains("ShuffledHashJoin"), s"offsets join-back missing:\n$p")
    var rest = p
    var guard = 0
    while (rest.contains("Exchange SinglePartition") && guard < 8) {
      val idx = rest.indexOf("Exchange SinglePartition")
      val after = rest.substring(idx)
      val nextEx = after.indexOf("Exchange hashpartitioning", 1)
      val subtree = if (nextEx > 0) after.substring(0, nextEx) else after
      assert(subtree.contains("HashAggregate"),
        s"single-partition window not over aggregated totals:\n$p")
      rest = after.substring(1)
      guard += 1
    }
  }

  test("tokenizer_fertility and shard_manifest: one scan, partial aggregate, no join, no window") {
    for (key <- Seq("tokenizer_fertility", "shard_manifest")) {
      val p = plan(key)
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$key scans:\n$p")
      assert(!p.contains("Join"), s"$key grew a join:\n$p")
      assert(!p.contains("Window"), s"$key grew a window:\n$p")
      // partial-then-final aggregate pair (map-side combine present)
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$key agg:\n$p")
      assert(!p.contains("SinglePartition"), s"$key collapsed:\n$p")
    }
  }

  test("pq_recall_calib and quantized_topk_recall: corpus work confined to the cal-v1 sample checkpoint") {
    for (key <- Seq("pq_recall_calib", "quantized_topk_recall")) {
      val p = plan(key)
      // the count + md5 sample filter ran inside calSampleOf's
      // checkpoint — the final plan roots on the bounded sample
      assert(p.contains("Scan ExistingRDD"), s"$key sample not pinned:\n$p")
      assert(!p.contains("Scan parquet"),
        s"$key re-scanned embeddings above the sample checkpoint:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$key degraded to SMJ:\n$p")
    }
  }

  test("simhash_hamming_pairs: block join runs over collapsed DISTINCT signature values; member fan-out joins are shuffle-hash") {
    val df = SparkEntry.queries("simhash_hamming_pairs")(spark, sf)
    df.collect() // finalize AQE so the chosen join strategies are visible
    val p = df.queryExecution.executedPlan.toString
    // the exact-collapse guard: a distinct keyed by the signature ALONE
    // (no doc_id) must feed the block join — a regression to the
    // per-document block join (measured 1.76B raw rows at the 25×
    // corpus) would key this aggregate by doc_id and pass every
    // output-equality test, so pin the plan shape here
    assert("HashAggregate\\(keys=\\[simhash#\\d+L?\\]".r.findFirstIn(p).isDefined,
      s"no distinct-signature collapse below the block join in:\n$p")
    // both member fan-out joins honor the shuffle_hash hint: the pair
    // frames are corpus-derived (candidate-sized on adversarial
    // all-distinct-signature data) and must never be broadcast
    assert("ShuffledHashJoin".r.findAllIn(p).size >= 2,
      s"member fan-out joins lost the shuffle-hash discipline:\n$p")
  }

  test("delta_ann_index: shard filter pushed to the scan, codebook broadcast, no window, no SMJ") {
    val df = SparkEntry.queries("delta_ann_index")(spark, sf)
    df.collect() // finalize AQE (and force the Materialize build)
    val p = df.queryExecution.executedPlan.toString
    // the arriving shard is the ONLY raw-embedding scan, and its split
    // predicate reaches the reader — an unpushed filter would re-read
    // the whole 100 TB store per shard job
    assert(p.contains("GreaterThanOrEqual(vec_id"),
      s"shard split filter not pushed to the scan:\n$p")
    // the frozen codebook is config-sized by contract — broadcast
    assert(p.contains("BroadcastExchange"), s"codebook not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"incremental encode grew a sort/window:\n$p")
  }

  test("corpus_to_shards: gate chains pinned behind checkpoints, join-backs shuffle-hash, 32-row manifest aggregate") {
    val df = SparkEntry.queries("corpus_to_shards")(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // the survivor/selection chains ran once inside their checkpoints —
    // the manifest plan roots on the pinned frames, it never re-scans
    // documents (a per-consumer gate re-run is 3 dead corpus passes)
    assert(p.contains("Scan ExistingRDD"),
      s"selection not pinned behind a checkpoint:\n$p")
    assert(!p.contains("Scan parquet"),
      s"documents re-scanned above the selection checkpoint:\n$p")
    // pack offsets + bin join-back keep the shuffle-hash discipline
    assert(p.contains("ShuffledHashJoin"), s"join discipline lost:\n$p")
    // partial-then-final manifest aggregate (map-side combine present)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("delta_corpus_to_shards: frozen corpus enters only via stored artifacts; delta chain pinned; ⊕ is one aggregate") {
    val df = SparkEntry.queries("delta_corpus_to_shards")(spark, sf)
    df.collect() // finalize AQE (and force the stored-state build)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the stored corpus manifest is a parquet scan of the Materialize
    // artifact — the incremental path's static ⊕ left operand
    assert(p.contains("graft_mv"),
      s"stored manifest not read from the materialized artifact:\n$p")
    // no documents scan survives above the delta checkpoints: a corpus
    // re-scan here would break the shard-sized-work contract
    val docScans = p.linesIterator
      .filter(l => l.contains("parquet") && l.contains("documents"))
      .toSeq
    assert(docScans.isEmpty,
      s"documents re-scanned above the delta checkpoints:\n$docScans\n$p")
    assert(p.contains("ExistingRDD"),
      s"admitted set not checkpointed:\n$p")
    // the manifest bin join-back keeps the shuffle-hash discipline and
    // the ⊕ is one partial-then-final aggregate over two 32-row sides
    assert(p.contains("ShuffledHashJoin"),
      s"manifest join-back lost the shuffle-hash discipline:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"degraded to SMJ:\n$p")
  }

  test("bench-action rationale: count() prunes delta_dedup's dedup subtree — Bench must use Harness.exhaust") {
    // Catalyst eliminates a left outer join whose right side is unique
    // on the join key when only left columns are referenced; count(1)
    // references nothing, so delta_dedup.count() collapses to a
    // filtered scan count (measured round 17 — the bench rows for the
    // delta keys had timed a parquet scan). This pins BOTH halves: the
    // pruning exists (so a count-based bench is structurally wrong
    // here), and the frame's own plan — what Harness.exhaust executes —
    // still carries the dedup joins. If a Spark upgrade stops the
    // pruning, the first assert fails: re-evaluate, don't just flip it.
    val df = SparkEntry.queries("delta_dedup")(spark, sf)
    val cnt = df.groupBy().count().queryExecution.optimizedPlan.toString
    assert(!cnt.contains("Join"),
      s"count() no longer prunes the dedup subtree:\n$cnt")
    val own = df.queryExecution.optimizedPlan.toString
    assert(own.contains("Join"), s"frame plan lost its joins:\n$own")
  }

  test("minhash_band_calib: corpus work confined to the sample checkpoint; result is a bounded aggregate") {
    val p = plan("minhash_band_calib")
    // the only corpus-sized pass (scan + null filter + md5 sample
    // filter) ran inside the checkpoint — the final plan's leaves are
    // all the bounded-sample ExistingRDD
    assert(p.contains("Scan ExistingRDD"), s"sample not pinned:\n$p")
    assert(!p.contains("Scan parquet"),
      s"documents re-scanned above the sample checkpoint:\n$p")
    // the Jaccard joins keep the shuffle-hash discipline (broadcasts
    // are allowed only for the sample-bounded sides)
    assert(p.contains("ShuffledHashJoin"), s"join discipline lost:\n$p")
    assert(!p.contains("SortMergeJoin"), s"degraded to SMJ:\n$p")
  }
}
