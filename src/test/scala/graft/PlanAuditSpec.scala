package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Automated plan audits: the scale properties the engine promises
  * (pushdown, pruning, broadcast strategies, no embedding bytes
  * through a shuffle, single-exchange windows) asserted against the
  * formatted physical plan, so a refactor can't silently regress them.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    // audits must see the COLD plan: cached frames left by other
    // suites (the operators' documented persist convention) otherwise
    // substitute InMemoryRelations whose printed cachedPlan subtrees
    // double-count exchanges, making audit results depend on suite
    // execution order
    spark.catalog.clearCache()
    TestSpark.fullPlan(SparkEntry.queries(name)(spark, sf))
  }

  /** `Input [n]: [...]` attribute lists of every `(k) Exchange` node
    * (shuffles only — BroadcastExchange nodes are named differently). */
  private def shuffleInputs(plan: String): Seq[String] = {
    val nodeIds = raw"\((\d+)\) Exchange\b".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    nodeIds.toSeq.flatMap { id =>
      raw"(?s)\($id\) Exchange\n(.*?)\n\n".r.findFirstMatchIn(plan).map(_.group(1))
    }
  }

  test("every driver query ships with a SQL oracle (no silent rows-only regressions)") {
    // every query needs an oracle in exactly one map: static SQL, or
    // the dynamic map for oracles that interpolate a corpus-trained /
    // corpus-measured artifact (BPE merges, adaptive LSH geometry) —
    // Verify evaluates those per-corpus and merges them into
    // oracle_sql.json, so the driver compare is still hash-checked.
    val dynamic = SparkEntry.oracleSqlDynamic.keySet
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- dynamic
    assert(missing.isEmpty, s"queries without oracles: $missing")
    val orphaned =
      (SparkEntry.oracleSql.keySet ++ dynamic) -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
    assert((SparkEntry.oracleSql.keySet & dynamic).isEmpty,
      "a key must not carry both a static and a dynamic oracle")
  }

  test("q1: shipdate predicate pushed to the scan, unused columns pruned") {
    val p = formatted("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach the parquet scan")
    assert(!p.contains("l_comment") && !p.contains("l_partkey"),
      "scan must prune columns the query never touches")
  }

  test("ann_ivf: no shuffle exchange carries an embedding column") {
    val p = formatted("ann_ivf")
    val bad = shuffleInputs(p).filter(in => in.contains("emb"))
    assert(bad.isEmpty, s"embedding-carrying shuffle(s): $bad")
    assert(p.contains("BroadcastHashJoin"), "probe join must be broadcast")
  }

  test("cdc_group_table_maps: exactly one shuffle (the per-file window)") {
    val p = formatted("cdc_group_table_maps")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n == 1, s"expected 1 shuffle exchange, plan has $n")
  }

  test("cdc_schema_attach: registry attaches via broadcast join, log side never sorted/shuffled whole") {
    val p = formatted("cdc_schema_attach")
    assert(p.contains("BroadcastHashJoin"), "as-of attach must be a broadcast hash join")
    // the full log rows (with val/us columns) must not pass through a
    // shuffle — only control relations (tx ids, registry versions) may
    val bad = shuffleInputs(p).filter(in => in.contains("val") || in.contains("us"))
    assert(bad.isEmpty, s"log-carrying shuffle(s): $bad")
  }

  test("cdc_schema_migrate: alignment rides broadcast joins; per-row kernels are codegen'd natives") {
    val p = formatted("cdc_schema_migrate")
    assert(p.contains("BroadcastHashJoin"), "attach and alignment joins must broadcast")
    // the fused kernels must be in the plan (not the interpreted HOF stack)
    assert(p.contains("synthvals") || p.contains("SynthVals"), "native synthesis kernel missing")
    assert(p.contains("alignsig") || p.contains("AlignSig"), "native signature kernel missing")
    // no log-carrying shuffle: migration adds zero exchanges over the attach
    val bad = shuffleInputs(p).filter(in => in.contains("vals_") || in.contains("val#"))
    assert(bad.isEmpty, s"log-carrying shuffle(s): $bad")
  }

  test("cdc_gtid_valid: executed-window control frame broadcasts; the log shuffles only parsed gtid pairs") {
    val p = formatted("cdc_gtid_valid")
    assert(p.contains("BroadcastHashJoin"), "token validation must broadcast the executed window")
    val bad = shuffleInputs(p).filter(in => in.contains("val#") || in.contains("etype"))
    assert(bad.isEmpty, s"full-log shuffle(s): $bad")
  }

  test("cdc_entity_state: rolled-back txs filtered via broadcast anti-join") {
    val p = formatted("cdc_entity_state")
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("LeftAnti BuildRight"),
      "tx filter must be a broadcast anti-join, not a shuffle join")
  }

  test("sampling/split/repetition/quality operators are map-only (zero exchanges)") {
    Seq("stratified_sample", "train_test_split", "doc_repetition", "quality_filter",
        "doc_chunk", "pii_scrub", "multimodal_features", "text_normalize", "emb_quantize")
      .foreach { q =>
        val n = raw"\(\d+\) Exchange\b".r.findAllIn(formatted(q)).size
        assert(n == 0, s"$q must not shuffle, found $n exchange(s)")
      }
  }

  test("seq_pack: exactly one exchange (the per-shard packing window)") {
    val p = formatted("seq_pack")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n == 1, s"per-shard running sum needs exactly 1 exchange, found $n")
  }

  test("cdc_state_at: position predicate reaches the parquet scan") {
    val p = formatted("cdc_state_at")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(event_id"),
      "pos <= cut must push down (pos = event_id at the scan)")
  }

  test("decontaminate: benchmark set broadcasts; no shuffle carries text or shingles") {
    val p = formatted("decontaminate")
    assert(p.contains("BroadcastHashJoin"), "bench probe must be a broadcast join")
    val bad = shuffleInputs(p).filter(in => in.contains("text") || in.contains("sh#"))
    assert(bad.isEmpty, s"corpus-body-carrying shuffle(s): $bad")
  }

  test("domain_mix: per-stratum cap applied map-side before the exchange") {
    val p = formatted("domain_mix")
    assert(raw"WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expect partial (pre-shuffle) + final WindowGroupLimit")
  }

  test("dedup_embedding_lsh: the candidate self-join never shuffles an embedding") {
    val p = formatted("dedup_embedding_lsh")
    // band rows carry (vec_id, bks, band, bk) — embeddings re-attach to
    // surviving candidates only, via broadcast or a final id-keyed join;
    // no exchange may carry the embedding array itself
    val bad = shuffleInputs(p).filter(_.contains("embedding"))
    assert(bad.isEmpty, s"embedding-carrying shuffle(s): $bad")
  }

  test("dedup_semantic: codebook assignment is a plan-constant map; candidate self-join never shuffles an embedding") {
    val p = formatted("dedup_semantic")
    assert(p.contains("nearestcentroids") || p.contains("NearestCentroids"),
      "assignment must be the codegen'd plan-constant expression, not a join against a centroid relation")
    val bad = shuffleInputs(p).filter(_.contains("embedding"))
    assert(bad.isEmpty, s"embedding-carrying shuffle(s): $bad")
  }

  test("dedup_incremental: bloom bit-test prefilters the snapshot; no shuffle ever carries text") {
    val p = formatted("dedup_incremental")
    assert(p.contains("shiftrightunsigned"),
      s"the codegen'd bloom bit test must gate the snapshot side:\n$p")
    val bad = shuffleInputs(p).filter(_.contains("text#"))
    assert(bad.isEmpty, s"document-body-carrying shuffle(s): $bad")
  }

  test("dedup_incremental_lsh: only the compute fan-out ships text; the index joins ship ids+buckets") {
    // the public operator returns an eager checkpoint scan (so its
    // corpus-sized caches can be released before return) — audit the
    // underlying lazy plan via the internal builder
    spark.catalog.clearCache()
    val (lazyPlan, cached) = graft.operators.Dedup.incrementalNearDupPlan(
      Tables.documents(spark, sf), cutoff = 250L)
    val p = TestSpark.fullPlan(lazyPlan)
    cached.foreach(_.unpersist(blocking = false))
    // ONE deliberate text-carrying exchange exists: the round-robin
    // fan-out BEFORE shingling, so the expensive shingle compute runs
    // at full parallelism instead of at the scan's partition count
    // (the minhashLsh trade). Everything downstream — collapse,
    // banding, candidate join, verify — must ship ids/hashes only.
    val textShuffles = shuffleInputs(p).filter(_.contains("text#"))
    assert(textShuffles.size <= 1,
      s"only the pre-shingle fan-out may carry text: $textShuffles")
  }

  test("token_count_bpe: encoding is a map-only plan — zero exchanges, merge table rides as a plan constant") {
    val p = formatted("token_count_bpe")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n == 0, s"BPE counting must not shuffle, found $n exchanges:\n$p")
    assert(p.contains("bpe_count"), "the codegen'd expression must be in the plan")
  }

  test("ann_topk_filtered: the metadata filter lands BELOW the scoring join") {
    val p = formatted("ann_topk_filtered")
    // a semi-join (or AQE'd broadcast variant) restricts candidates
    // BEFORE the nested-loop scoring join — post-filtering the top-k
    // would have no join below the window at all
    assert(p.contains("LeftSemi"), s"filter must be a semi-join below the scoring join:\n$p")
    val bad = shuffleInputs(p).filter(_.contains("embedding"))
    assert(bad.isEmpty, s"embedding-carrying shuffle(s): $bad")
  }

  test("ann_ivfpq: the quantized scan ships codes, never an embedding, through any shuffle") {
    val p = formatted("ann_ivfpq")
    val bad = shuffleInputs(p).filter(_.contains("embedding"))
    assert(bad.isEmpty, s"embedding-carrying shuffle(s): $bad")
    assert(p.contains("nearestcentroids") || p.contains("NearestCentroids"),
      "list assignment and PQ encode must be the codegen'd plan-constant expressions")
  }

  test("consistent_sample: root filter is a map-side hash test; dependents attach by semi-join") {
    val p = formatted("consistent_sample")
    assert(p.contains("LeftSemi"), s"orders must semi-join the sampled roots:\n$p")
    assert(p.contains("shiftrightunsigned"), "root membership must be the codegen'd hash test")
  }

  test("hybrid_search_rrf: keyword side ships (token, id) rows — no text through any shuffle") {
    val p = formatted("hybrid_search_rrf")
    val bad = shuffleInputs(p).filter(_.contains("text#"))
    assert(bad.isEmpty, s"document-body-carrying shuffle(s): $bad")
  }

  test("cdc_debezium_decode: envelope decode is map-only — zero exchanges") {
    val p = formatted("cdc_debezium_decode")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n == 0, s"synthesize→decode→project must not shuffle, found $n exchange(s)")
  }

  test("cdc_debezium_decode: the parse runs against the PRUNED envelope schema") {
    // the graded decode passes Debezium.ImagedChangeColumns, so the
    // from_json schema must carry only the 7 leaf fields the consumer
    // reads (+op) — a full-envelope parse here means the pruning
    // silently stopped reaching the parser
    spark.catalog.clearCache()
    val analyzed = SparkEntry.queries("cdc_debezium_decode")(spark, sf)
      .queryExecution.analyzed
    val schemas = analyzed.collect {
      case n => n.expressions.flatMap(_.collect {
        case j: org.apache.spark.sql.catalyst.expressions.JsonToStructs => j.schema
      })
    }.flatten
    assert(schemas.nonEmpty, "no from_json found in the graded decode plan")
    def leaves(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case s: org.apache.spark.sql.types.StructType => s.fields.map(f => leaves(f.dataType)).sum
      case _ => 1
    }
    // auto-mode schema = payload(env) + flat(env): 2 × the pruned
    // envelope's 7 leaves (before.id, after.id, after.value,
    // source.{table,file,pos}, op — name/db/gtid/ts_ms/tx pruned away;
    // the full envelope has 15, so an unpruned auto parse shows 30)
    val got = schemas.map(leaves).max
    assert(got == 14, s"expected 14 parsed leaves (2 × 7 pruned), got $got — " +
      "an unpruned auto-mode parse would show 30")
  }

  test("cdc_update_images: single-scan generate expansion; fold + control exchanges only") {
    val p = formatted("cdc_update_images")
    // one log scan exploding rows into images (Generate), ONE fold
    // exchange on (tbl,id), plus the tiny rolled-back-tx distinct that
    // feeds the broadcast anti-join — a union-of-branches expansion
    // would scan the 100 TB log three times
    assert(p.contains("Generate"), "image expansion must be an explode, not a union")
    assert(!p.contains("Union"), "no multi-branch re-scan of the log")
    assert(raw"Scan parquet\s+\(\d+\)".r.findAllIn(p).size <= 2,
      "log + control scans only — expansion must not multiply scans")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n <= 2, s"fold + control-distinct exchanges only, found $n")
  }

  test("tfidf_topk: tf combines map-side; per-doc top-k capped before its exchange") {
    val p = formatted("tfidf_topk")
    // partial aggregation must run before the (doc_id, term) exchange —
    // a doc's tokens live in one row, so the partial agg finishes every
    // group map-side and the shuffle carries result-sized tf rows
    assert(p.contains("HashAggregate"), "tf must be a hash aggregate")
    assert(raw"WindowGroupLimit".r.findAllIn(p).size >= 2,
      "per-doc top-k needs partial (pre-shuffle) + final WindowGroupLimit")
    val bad = shuffleInputs(p).filter(_.contains("text"))
    assert(bad.isEmpty, s"document-body-carrying shuffle(s): $bad")
  }

  test("term_rarity / substr_dup: no shuffle ever carries document text") {
    Seq("term_rarity", "substr_dup").foreach { q =>
      val bad = shuffleInputs(formatted(q)).filter(_.contains("text"))
      assert(bad.isEmpty, s"$q: document-body-carrying shuffle(s): $bad")
    }
  }

  test("asof joins: exactly one shuffle (the key window), both directions") {
    Seq("asof_join", "asof_join_fwd").foreach { q =>
      val n = raw"\(\d+\) Exchange\b".r.findAllIn(formatted(q)).size
      assert(n == 1, s"$q: union+window needs exactly 1 exchange, found $n")
    }
  }

  test("interval_overlap: stat reduces + bucket join only; pair dedup shuffles nothing") {
    val p = formatted("interval_overlap")
    // 2 one-row stat aggregates + the bucket equi-join's two sides;
    // the first-shared-bucket pair dedup must NOT add a distinct
    // exchange on the pair key
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n <= 4, s"expected at most 4 exchanges, found $n")
    assert(!p.contains("CartesianProduct"), "no cartesian between interval sides")
  }

  test("dedup_simhash: no groupBy/distinct exchange for pair dedup (map-side first-band)") {
    val p = formatted("dedup_simhash")
    // pair dedup used to be a groupBy(a_gid, b_gid); now only the
    // collapse, member join and rollup exchanges remain
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n <= 6, s"unexpected extra exchange(s): $n")
    assert(p.contains("simhashfirstband") || p.contains("SimHashFirstBand"),
      "first-band filter must be in the plan")
  }

  test("shard_assign: exactly one shuffle (the shard hash partition), no global sort") {
    val p = formatted("shard_assign")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n == 1, s"shard addressing needs exactly the shard exchange, found $n")
    assert(!p.contains("rangepartitioning".toLowerCase) && !p.contains("RangePartitioning"),
      "a range exchange would be a global sort of the corpus")
  }

  test("corpus_stats: histogram shuffles carry (stratum, tc) counts — never text") {
    val p = formatted("corpus_stats")
    val bad = shuffleInputs(p).filter(_.contains("text"))
    assert(bad.isEmpty, s"document-body-carrying shuffle(s): $bad")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(n <= 2, s"histogram + stratum window, found $n exchanges")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "histogram must combine map-side")
  }

  test("cdc_log_compact: one key-window shuffle; tx filter stays broadcast") {
    val p = formatted("cdc_log_compact")
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("LeftAnti BuildRight"),
      "committed-tx filter must remain a broadcast anti-join")
    val n = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    // the (tbl, id) window, plus the tiny rolled-back-tx distinct
    assert(n <= 2, s"expected ≤ 2 exchanges, found $n")
  }

  test("q6: all three range predicates pushed to the scan; ReadSchema is the 4 referenced columns") {
    val p = formatted("q6_forecast_revenue")
    val pushed = raw"PushedFilters: \[(.*?)\]".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"$c filter must reach the parquet scan, pushed=[$pushed]")
    }
    val read = raw"ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").length == 4,
      s"scan must read exactly the 4 referenced columns, got $read")
  }

  test("rollup_summary: one scan, one Expand, one exchange — not three UNION'd aggregates") {
    val p = formatted("rollup_summary")
    assert(raw"\(\d+\) Scan parquet".r.findAllIn(p).size == 1,
      "ROLLUP must scan lineitem once")
    assert(raw"\(\d+\) Expand\b".r.findAllIn(p).size == 1,
      "the three grouping levels come from a single Expand")
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      "one group-key exchange after the partial aggregate")
  }

  test("event_pivot: explicit value list — one scan, no collect-distinct pre-job, both phases partial") {
    val p = formatted("event_pivot")
    assert(raw"\(\d+\) Scan parquet".r.findAllIn(p).size == 1,
      "pivot with a literal value list must not re-scan for distinct values")
    // Spark's standard pivot shape: (user,type) count, then pivotfirst
    // by user — two exchanges, each fed by a partial aggregate so the
    // shuffles carry per-key counts, not events
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 2,
      s"the two cascaded agg phases:\n$p")
    assert(p.contains("partial_pivotfirst"),
      "the pivot phase must combine map-side too")
    assert(!p.contains("Expand"), "pivot-on-agg must not Expand the scan")
  }

  test("ann_lsh: corpus never shuffles — band probe and verify attach are broadcast joins") {
    val p = formatted("ann_lsh")
    // the ONLY shuffle is the per-query top-k window over the scored
    // candidates (occupancy-bounded rows); the exploded corpus stream
    // and both embedding attaches ride broadcast joins
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"banded search must shuffle only the tiny scored-candidate window input:\n$p")
    assert(raw"BroadcastExchange".r.findAllIn(p).size >= 3,
      s"query probe + candidate attach + query-embedding attach all broadcast:\n$p")
  }

  test("cdc_scd2: the whole version history costs ONE key exchange") {
    val p = formatted("cdc_scd2")
    // exchange 1: the control-sided rolled-back-tx distinct (tiny);
    // exchange 2: THE (tbl,id) partition — both windows (change-point
    // lag, version-closing lead) must share it, so exactly two total
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 2,
      s"the two windows must share one key exchange (plus the tx-set distinct):\n$p")
    assert(raw"\(\d+\) Window\b".r.findAllIn(p).size == 2 &&
      raw"\(\d+\) Sort\b".r.findAllIn(p).size == 1,
      s"two windows over a single sort — the shared partitioning:\n$p")
  }

  test("bloom_prune: the bit-test prefilter runs on the probe side, before the join") {
    val p = formatted("bloom_prune")
    val filterIdx = p.indexOf("shiftrightunsigned")
    assert(filterIdx >= 0, s"the codegen'd bit test must appear as a Filter:\n$p")
    // the filter must be INSIDE the plan (below the join), not a
    // post-join residual: find the join node and compare positions in
    // the operator list (formatted plans list leaves first)
    assert(p.contains("Filter"), s"prefilter missing:\n$p")
  }

  test("join_size_est: estimates the overlap WITHOUT joining the relations") {
    val p = formatted("join_size_est")
    // the only joins allowed are the 1-row sketch cross join and the
    // exact-check join of the CHECKED variant; the raw relations must
    // reach only aggregates. Assert by absence of any equi-join ON
    // the key columns' unaggregated form: no SortMergeJoin at all.
    assert(!p.contains("SortMergeJoin"),
      s"sketch estimation must never shuffle-join the inputs:\n$p")
  }

  test("dedup_containment: no shuffle ever carries document text") {
    // (hashed shingle ARRAYS legitimately cross the verify join's
    // exchange once — they are the compact payload the pair needs;
    // raw text must never)
    val p = formatted("dedup_containment")
    shuffleInputs(p).foreach { in =>
      assert(!in.contains("text#"),
        s"a shuffle carries document text:\n$in")
    }
  }

  test("page_rank: iterations are narrow key exchanges — no global sort, no cartesian") {
    val p = formatted("page_rank")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the rank loop:\n$p")
    // the only global ordering is the driver-sized final top-20
    assert(raw"\(\d+\) TakeOrderedAndProject".r.findAllIn(p).size == 1,
      s"one distributed top-k, no other global sorts:\n$p")
    assert(!raw"\(\d+\) Sort\b.*\[global=true".r.findAllIn(p).hasNext,
      s"no global range sort anywhere in the rank loop:\n$p")
  }

  test("near_dup_jaccard: array attaches are HASH joins, gated by MEASURED build bytes — the quadratic pair stream is never sorted") {
    // The SMJ alternative externally sorts the candidate×array stream
    // (measured at sf1: >75 GB of sort spill — the disk-full failure
    // this audit pins the fix for). r13 gates the strategy on the
    // measured build-side bytes: within the broadcast budget the doc
    // projection BROADCASTS (the candidate stream is never shuffled
    // at all — the small-corpus plan the unconditional r11 pin taxed
    // ~1 s); past the budget the joins pin SHUFFLED hash. Both
    // branches asserted here by flipping the budget.
    def noArraySmj(p: String): Unit =
      p.split("\n\n").filter(b => raw"^\(\d+\) SortMergeJoin".r.findFirstIn(b).isDefined)
        .foreach { b =>
          assert(!b.contains("a_sh") && !b.contains("b_sh"),
            s"a sort-merge join touches shingle arrays:\n$b")
        }
    val p = formatted("near_dup_jaccard")
    assert(raw"\(\d+\) BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"tiny corpus fits the budget: both array attaches must broadcast:\n$p")
    noArraySmj(p)
    // budget off → the measured gate must fall back to the sf1 pin
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p2 = formatted("near_dup_jaccard")
      assert(raw"\(\d+\) ShuffledHashJoin".r.findAllIn(p2).size >= 2,
        s"past the budget both array attaches must pin SHUFFLE_HASH:\n$p2")
      noArraySmj(p2)
    } finally spark.conf.set(key, old)
  }

  test("bm25_topk: query terms broadcast; per-query top-k caps map-side") {
    val p = formatted("bm25_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim-sized query-term table must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rnk<=k must cap partitions before the final exchange:\n$p")
  }

  test("lm_score: no cartesian; doc rollup is result-sized (V is a driver constant since r13)") {
    val p = formatted("lm_score")
    assert(!p.contains("CartesianProduct"),
      s"no join in the LM may become a real cartesian:\n$p")
    // per-doc bigram counts combine map-side before any exchange —
    // the shuffle carries (doc, bigram, n) result rows, never one row
    // per bigram occurrence
    assert(p.contains("partial_count"),
      s"bigram counting must have a partial aggregate:\n$p")
  }

  test("tableStats scale path: one scan, all per-column sketches partial, no Expand") {
    import org.apache.spark.sql.functions.col
    val p = TestSpark.fullPlan(graft.operators.Sketch.tableStats(
        graft.Tables.lineitem(spark, sf),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")))
    assert(raw"\(\d+\) Scan parquet".r.findAllIn(p).size == 1,
      s"ANALYZE must fold every column's stats in ONE pass:\n$p")
    assert(p.contains("partial_kmin_values"),
      "per-column NDV sketches must combine map-side")
    assert(!p.contains("Expand"),
      "no Expand — the exact multi-distinct plan is what the sketches replace")
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"one single-row exchange of the combined stats:\n$p")
  }

  test("cached frame pre-partitioned by the join key skips its per-round exchange (CC/pageRank shape)") {
    // connectedComponents and Graph.pageRank repartition their edge
    // cache by the per-round join key (r18): each round is a separate
    // action, so ReusedExchange never applies across rounds, and the
    // saving relies on InMemoryTableScan REPORTING the cached frame's
    // hashpartitioning so EnsureRequirements drops the edge-side
    // exchange. Pin that propagation: if a Spark upgrade stops
    // carrying partitioning through the cache, the iterative shuffle
    // savings silently evaporate — this spec is the alarm.
    import org.apache.spark.sql.functions._
    val big = spark.range(1000)
      .select((col("id") % 97).as("v"), col("id").as("payload"))
      .repartition(col("v")).persist()
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.enabled"
    val (bc0, aqe0) = (spark.conf.get(bcKey), spark.conf.get(aqeKey))
    try {
      big.count() // materialize the cache
      // deterministic probe: no broadcast (force a shuffle join) and
      // no AQE (so executedPlan is the static tree). InMemoryTableScan
      // is a LEAF of the operator tree, so the cache's own build-time
      // exchange is not counted — only per-round shuffles are.
      spark.conf.set(bcKey, "-1")
      spark.conf.set(aqeKey, "false")
      val small = spark.range(97).select(col("id").as("v"), (col("id") * 2).as("label"))
      val qe = big.join(small, Seq("v")).queryExecution
      val shuffles = qe.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.size
      assert(shuffles == 1,
        s"cached hashpartitioning(v) must satisfy the join's requirement " +
          s"(expected 1 exchange on the probe side, got $shuffles):\n${qe.executedPlan}")
    } finally {
      spark.conf.set(bcKey, bc0)
      spark.conf.set(aqeKey, aqe0)
      big.unpersist(blocking = true)
    }
  }
}
