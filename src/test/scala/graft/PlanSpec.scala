package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regressions: these assert the physical-plan
  * properties the 100 TB design depends on — filter pushdown and
  * column pruning at the parquet scan, broadcast joins for bounded
  * dims, top-k fusion, and whole-stage codegen around the custom
  * dot-product kernel. If a refactor silently loses one of these, the
  * suite fails even though results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(SparkFixture.spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("filters and projection reach the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read schema: the 6 needed columns, not all 16
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') < 7, s"scan reads too many columns: $read")
  }

  test("bounded dims broadcast; top-k fuses to TakeOrderedAndProject") {
    val p = plan("q_join6_star")
    assert(p.contains("BroadcastHashJoin"))
    val p3 = plan("q_join3_topk")
    assert(p3.contains("TakeOrderedAndProject"))
    // vocab induction: the driver holds 50 rows, never the vocabulary
    val pv = plan("q_vocab_topk")
    assert(pv.contains("TakeOrderedAndProject"))
    assert("HashAggregate".r.findAllIn(pv).size >= 2 && pv.contains("partial_"))
  }

  test("partial aggregation happens map-side (two HashAggregate phases)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_"))
  }

  test("graft_dot runs inside whole-stage codegen") {
    val df = graft.ops.Similarity.qCosinePairs.run(SparkFixture.spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dotproduct"), "custom kernel missing from plan")
    // codegen stages render as "*(n)" in the final adaptive plan
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      "plan lost whole-stage codegen around the kernel")
  }

  test("dedup candidate generation has no cartesian product") {
    Seq("q_dedup_minhash_lsh", "q_dedup_ngram_jaccard", "q_ann_lsh",
      "q_dedup_containment", "q_dedup_incremental")
      .foreach { n =>
        val p = plan(n)
        assert(!p.contains("CartesianProduct"),
          s"$n must generate candidates via equi-join, not all-pairs")
      }
  }

  test("sliding chunking is a narrow per-row transform") {
    val p = plan("q_chunk_sliding")
    assert(!p.contains("Join"), "chunking must not join")
    // only the presentation sort may exchange
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size <= 1,
      "chunking must not shuffle beyond the presentation sort")
  }

  test("diversity and ensemble aggregate with map-side partials") {
    Seq("q_text_diversity", "q_quality_ensemble").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Join"), s"$n must not join")
      assert(p.contains("partial_"), s"$n must combine map-side")
    }
  }

  test("ivf-pq candidates come from the probed-cell equi-join") {
    val p = plan("q_ann_ivf_pq")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop is the bounded 8-seed broadcast assignment
    // (same allowance as q_ann_ivf); candidate × code ranking joins
    // must all be hash joins on integer keys
    assert(p.contains("BroadcastHashJoin"),
      "probes/ADC table must broadcast-hash-join the candidate scan")
  }

  test("vocab coverage broadcasts the induced basis to the token scan") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"),
      "the 64-row vocabulary must broadcast, never shuffle the tokens")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("semantic outlier broadcasts the label sums to the vector scan") {
    val p = plan("q_semantic_outlier")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny label-sums side must broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"),
      "the vector payload must never shuffle for this join")
  }

  test("canonical pair generator has no all-pairs join of any kind") {
    val p = plan("q_embed_pairs_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "q_embed_pairs_lsh must build candidates from bucket equi-joins")
  }

  test("lsh band self-join shuffles the band table once at scale") {
    // At cluster scale the band self-join is a sort-merge join; both
    // sides are the identical plan, so Spark must plan ONE exchange
    // and a ReusedExchange, not shuffle the band table twice. The
    // fixture would broadcast, so force the SMJ path for the check.
    val spark = SparkFixture.spark
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the candidate frame is session-cached (shared by the three
      // pair consumers); drop it so this check sees the band
      // self-join's own physical plan, then look INSIDE the cache
      // materialization plan where the join now lives
      spark.catalog.clearCache()
      val df = SparkEntry.queries("q_embed_pairs_lsh")(spark, dir)
      df.collect() // finalize the adaptive plan
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => s
      }
      val p =
        if (scans.nonEmpty)
          scans.map(_.relation.cachedPlan.toString).mkString("\n")
        else df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        "band self-join must reuse one exchange for both sides")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.catalog.clearCache()
    }
  }

  test("pq encode broadcasts the codebook and keeps scans narrow") {
    val p = plan("q_embed_pq")
    assert(p.contains("BroadcastHashJoin"),
      "the 128-row codebook must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("adc search joins lookups on (m, k), never the float vectors") {
    val p = plan("q_ann_adc")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "ADC must be equi-join lookups on the code table")
  }

  test("packing stays narrow: one exchange per window partition key") {
    val p = plan("q_pack_sequences")
    // the doc scan reads only the 3 needed columns
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') <= 2, s"scan reads too many columns: $read")
  }

  test("surprise scoring: model joins are hash joins on the vocab key") {
    val p = plan("q_text_surprise")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("contamination checks join benchmark grams/fingerprints by " +
    "hash key") {
    for (n <- Seq("q_contamination", "q_winnow_contamination")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$n: the benchmark membership test must be an equi-join")
      assert(p.contains("LeftSemi"), s"$n: hits should be a semi-join")
    }
  }

  test("classifier inference and int8 quantization are narrow maps: " +
    "no shuffle but the presentation sort") {
    for (n <- Seq("q_text_classify", "q_embed_quantize")) {
      val p = plan(n)
      assert(!p.contains("Join") && !p.contains("Window"),
        s"$n must not join or window — hashed weights need no vocab")
      assert("""Exchange \(\d+\)""".r.findAllIn(p).size <= 1,
        s"$n must scale by adding splits, not by shuffling")
    }
  }

  test("sampling/split audit counts broadcast back — no tiny-key " +
    "window funneling the corpus") {
    for (n <- Seq("q_split_train", "q_sample_stratified")) {
      val p = plan(n)
      assert(!p.contains("Window"),
        s"$n must not window over 3-5 keys (collapses to 3-5 tasks)")
      assert(p.contains("BroadcastHashJoin"),
        s"$n audit counts should broadcast-join back")
    }
  }

  test("ewma folds once per series: no per-row prefix-list window") {
    for (n <- Seq("q_ts_ewma", "q_ts_holt")) {
      val p = plan(n)
      assert(!p.contains("Window"),
        s"$n must not materialize per-row prefix lists via a window " +
          "(O(B^2) per series); fold once per series instead")
      assert(p.contains("MapGroups"),
        s"$n: the prefix emission should be one typed fold per series")
    }
  }

  test("semantic dedup: within-cell matching is an equi-join; only " +
    "the seed assignment may nested-loop against the broadcast seeds") {
    val df = graft.ops.Similarity.qSemanticDedup
      .run(SparkFixture.spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    // every nested-loop must be the documented coarse-quantizer shape
    // (a Cross against the IdentityBroadcast seed set) — the pairwise
    // step itself must never appear as a nested-loop
    val bnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.nonEmpty && bnlj.forall(_.contains("Cross")),
      s"non-assignment nested-loop in plan:\n${bnlj.mkString("\n")}")
    // and the pair generation joins on the cell key
    assert(p.linesIterator.exists(l =>
      (l.contains("HashJoin [cell") || l.contains("MergeJoin [cell"))),
      "within-cell pair generation must be an equi-join on cell")
  }

  test("token budget and corpus shuffle scale by partition key, and " +
    "their scans stay narrow") {
    for ((n, cols) <- Seq("q_token_budget" -> 3, "q_corpus_shuffle" -> 1)) {
      val p = plan(n)
      val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
      assert(read.count(_ == ',') < cols,
        s"$n scan reads too many columns: $read")
      assert(!p.contains("Join"), s"$n is a single-pass window op")
    }
  }

  test("weighted PPS sampling: prefix sum stays shard-partitioned, " +
    "offsets broadcast back") {
    val p = plan("q_sample_weighted")
    assert(p.contains("BroadcastHashJoin"),
      "shard offsets (≤16 rows) must broadcast, not shuffle the facts")
    // the fact-side running sum must be partitioned by shard; the only
    // unpartitioned window allowed is the ≤16-row offset stitch, which
    // sits on the aggregated (grouped-by-shard) side
    // must match the PARTITIONED fact-side window (shard, then the
    // hkey order key) — a bare "windowspecdefinition(shard" would
    // also match the unpartitioned ≤16-row offset stitch, making the
    // check vacuous
    assert("""windowspecdefinition\(shard#\d+L?, hkey""".r
      .findFirstIn(p).isDefined,
      "fact prefix sum must window per shard ordered by hkey")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') < 3,
      s"scan should read only doc_id/source/text: $read")
  }

  test("unpivot expands rows inside the scan stage without a shuffle") {
    val p = plan("q_unpivot")
    assert(p.contains("Generate") || p.contains("Expand"),
      "stack() should lower to a Generate/Expand, not a union of scans")
    // one scan feeds the expansion (formatted mode prints each node
    // twice: once in the tree, once in the details section)
    assert("""Scan parquet""".r.findAllIn(p).size <= 2,
      "unpivot must read the table once, not once per measure")
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size <= 1,
      "unpivot must not shuffle beyond the presentation sort")
  }

  test("TPC-H shapes: dims broadcast, fact scans stay filtered+narrow") {
    val withDims = Seq("q_tpch_q3", "q_tpch_q5", "q_tpch_q7", "q_tpch_q8",
      "q_tpch_q9", "q_tpch_q10", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16",
      "q_tpch_q17", "q_tpch_q20")
    for (n <- withDims) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"),
        s"$n must broadcast its bounded dimension side")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n has a degraded join")
    }
    for (n <- Seq("q_tpch_q4", "q_tpch_q6", "q_tpch_q13", "q_tpch_q18",
        "q_tpch_q21")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n has a degraded join")
    }
    // the date/flag predicates must actually reach the fact scans
    // (a "PushedFilters:" token alone is vacuous — every parquet scan
    // prints one; assert the specific pushed predicate)
    assert(plan("q_tpch_q3").contains("GreaterThan(l_shipdate"),
      "q3 must push the lineitem ship-date predicate to the scan")
    assert(plan("q_tpch_q5").contains("GreaterThanOrEqual(o_orderdate"),
      "q5 must push the orders date-range predicate to the scan")
    assert(plan("q_tpch_q10").contains("EqualTo(l_returnflag"),
      "q10 must push the return-flag predicate to the scan")
    // Q6 is the pure scan-filter-agg: every predicate reaches the scan
    // and the only exchange is the single-row final aggregate's.
    val p6 = plan("q_tpch_q6")
    assert(p6.contains("GreaterThanOrEqual(l_shipdate") &&
      p6.contains("LessThan(l_quantity"),
      "q6 must push date/discount/quantity predicates into the scan")
    assert("""Exchange \(\d+\)""".r.findAllIn(p6).size == 1,
      "q6 must shuffle only the partial-aggregate row")
    // top-k queries fuse the final sort+limit
    for (n <- Seq("q_tpch_q3", "q_tpch_q10", "q_tpch_q18", "q_tpch_q21"))
      assert(plan(n).contains("TakeOrderedAndProject"),
        s"$n must fuse its ORDER BY + LIMIT")
  }

  test("dup spans: doc-partitioned windows, equi-joins only") {
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "gram joins must stay equi")
    // the run-length window partitions by doc_id, never globally
    assert(p.contains("Window"), "gaps-and-islands needs a window")
    assert(!p.contains("Window [") || p.contains("partitionBy") ||
      p.contains("doc_id"), "window must be per-doc")
  }

  test("source overlap: dedup before the self-join, bounded fanout") {
    val p = plan("q_source_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the shingle self-join must be an equi-join on sh")
    // per-source sets dedup before pairing (HashAggregate above join)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("epoch mix is join-free: hash expressions, explode, sharded windows") {
    val p = plan("q_epoch_mix")
    assert(!p.contains("Join"), "epoch up-sampling must not join anything")
    assert(p.contains("Generate"), "copies materialize via explode")
  }

  test("winnowing is join-free: one doc-partitioned window over grams") {
    val p = plan("q_text_winnow")
    assert(!p.contains("Join"),
      "fingerprint selection is per-doc — nothing to join")
    // doc scan reads only doc_id + text
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') <= 1, s"scan reads too many columns: $read")
    // exactly one Window (the lead() chain shares a single spec)
    assert("""Window \(\d+\)""".r.findAllIn(p).size == 1,
      "the three lead() calls must fuse into one window operator")
  }

  test("bloom join: might_contain probes the fact scan below the semi") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"),
      "the bloom probe must survive into the physical plan")
    assert(p.contains("LeftSemi"), "exactness comes from the semi-join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the probe must sit in the Filter that is the semi-join's LEFT
    // child (i.e. before the join), not above it: in the formatted
    // tree the left child renders as ":- Filter (n)" right after the
    // LeftSemi line; that node id's detail section must carry the
    // might_contain condition
    val lines = p.linesIterator.toVector
    val joinIx = lines.indexWhere(_.contains("LeftSemi"))
    assert(joinIx >= 0)
    val childFilter = lines.drop(joinIx + 1)
      .flatMap(""":- Filter \((\d+)\)""".r.findFirstMatchIn(_))
      .headOption
    assert(childFilter.isDefined, "semi-join's left child must be a Filter")
    val detailIx = lines.indexWhere(
      _.startsWith(s"(${childFilter.get.group(1)}) Filter"))
    assert(detailIx >= 0 && lines.drop(detailIx).take(4)
      .exists(l => l.contains("might_contain") && l.contains("l_orderkey")),
      "the fact-side Filter below the semi-join must carry the probe")
  }

  test("edit-distance dedup: candidates from the prefix-block " +
    "equi-join, never all-pairs") {
    val p = plan("q_dedup_editdist")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "levenshtein must verify blocked candidates only")
  }

  test("lttb: corpus aggregates by (type,bucket); the only sorted " +
    "window is over the tiny bucket frame") {
    val p = plan("q_ts_lttb")
    assert(!p.contains("CartesianProduct"))
    // exactly one Window op — the NB-row-per-series neighbor frame;
    // point selection must be the max_by aggregate, not a window
    assert("""Window \(\d+\)""".r.findAllIn(p).size == 1,
      "per-point argmax must not sort the corpus inside 250 buckets")
    assert("HashAggregate".r.findAllIn(p).size >= 2 && p.contains("partial_"),
      "bucket stats and max_by selection must aggregate two-phase")
  }

  test("winnow overlap builds pairs from fp_hash equi-joins only") {
    val p = plan("q_winnow_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must be the df-capped fingerprint equi-join")
  }

  test("random projection is a narrow scan feeding codegen kernels") {
    val p = plan("q_embed_rp")
    // only vec_id + embedding should be read
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') <= 1, s"scan reads too many columns: $read")
    assert(p.contains("dotproduct"), "projection must use the fused kernel")
    // no shuffle but the presentation sort ("Exchange (n)" matches the
    // tree nodes; the bare word also appears in the detail section)
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size <= 1,
      "random projection must not shuffle the vectors")
  }

  test("nearest-in-time join runs as a tolerance-bucket equi-join") {
    val p = plan("q_ts_nearest_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "nearest join must bucket time, not nested-loop per user")
  }

  test("paragraph dedup: verdicts rejoin on the chunk-hash key only") {
    val p = plan("q_dedup_paragraphs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "chunk verdicts must come from a hash equi-join")
  }

  test("changelog compaction is one key shuffle with no joins") {
    val p = plan("q_dedup_latest")
    assert(!p.contains("Join"), "keep-latest must not join")
    // one exchange for the key window + the presentation sort's range
    // exchange; nothing else may move data
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size <= 2,
      "keep-latest must shuffle once on the dedup key")
  }

  test("cluster-balanced sampling broadcasts the per-cluster quotas") {
    val p = plan("q_sample_cluster")
    assert(p.contains("BroadcastHashJoin"),
      "quota join must broadcast the tiny per-cluster counts")
    assert(!p.contains("SortMergeJoin"))
  }

  test("SQL join hints steer the physical strategy") {
    val s = SparkFixture.spark
    graft.ops.Tables.views(s, dir)
    // orders⋈customer broadcasts by default at fixture scale; the
    // MERGE hint must force a sort-merge join...
    val merged = s.sql("""
      SELECT /*+ MERGE(customer) */ count(*)
      FROM orders JOIN customer ON o_custkey = c_custkey""")
      .queryExecution.executedPlan.toString
    assert(merged.contains("SortMergeJoin"),
      "MERGE hint ignored — broadcast chosen anyway")
    // ...and BROADCAST must override a disabled auto-threshold
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bcast = s.sql("""
        SELECT /*+ BROADCAST(customer) */ count(*)
        FROM orders JOIN customer ON o_custkey = c_custkey""")
        .queryExecution.executedPlan.toString
      assert(bcast.contains("BroadcastHashJoin"),
        "BROADCAST hint ignored with auto-broadcast disabled")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graft_nfc runs inside whole-stage codegen") {
    val df = graft.ops.TextOps.qTextNfc.run(SparkFixture.spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("nfcnormalize"), "NFC kernel missing from plan")
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      "plan lost whole-stage codegen around the NFC expression")
  }

  test("recursive CTE plans as UnionLoop, not an unrolled union") {
    val p = plan("q_cte_recursive")
    assert(p.contains("UnionLoop"),
      "WITH RECURSIVE must execute as the iterative loop operator")
    assert(!p.contains("CartesianProduct"))
  }

  test("LATERAL top-k decorrelates to a ranked-window plan") {
    val p = plan("q_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      "lateral LIMIT subquery must decorrelate, not re-execute per row")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("bm25 shuffles postings only: term filter precedes the tf " +
      "exchange; stats broadcast; top-10 fuses to TakeOrdered") {
    val p = plan("q_text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must fuse, not global-sort")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"), "df/corpus stats must broadcast")
    // the isin() term filter must exist and sit in a Filter node (below
    // the tf aggregation), so the shuffled tf input is the postings
    // subset, not the whole tokenized corpus
    assert(p.contains("IN (spark,window,join)") ||
      p.contains("IN (spark, window, join)"),
      "term filter missing from the physical plan")
  }

  test("pmi joins unigram counts by word key — hash join, no " +
      "cartesian, and both count aggs combine map-side") {
    val p = plan("q_text_pmi")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"), "pair/word counts must " +
      "partial-aggregate map-side before the exchange")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("graph family: every candidate join is an equi-join — the only " +
      "nested-loop rows are the 1-row stat crossJoins") {
    // pagerank: the 6-way edge derivation broadcasts every dim; the
    // 25-node iterated state never shuffles the fact table again
    val pr = plan("q_graph_pagerank")
    assert(!pr.contains("CartesianProduct"))
    assert(pr.contains("BroadcastHashJoin"),
      "nation/customer/supplier dims must broadcast in the edge join")
    // triangles: pair-gen and both wedge legs are equi-joins; hub
    // removal is an anti-join, not a filter-after-cross
    val tri = plan("q_graph_triangles")
    assert(!tri.contains("CartesianProduct"))
    assert(tri.contains("LeftAnti"), "hub removal must be an anti-join")
    val mk = plan("q_markov_transitions")
    assert(!mk.contains("CartesianProduct") &&
      !mk.contains("BroadcastNestedLoopJoin"))
    assert(mk.contains("Window"), "successor must come from lead(), " +
      "not a self-join")
    val ar = plan("q_assoc_rules")
    assert(!ar.contains("CartesianProduct"))
    assert(ar.contains("TakeOrderedAndProject"),
      "assoc-rules top-20 must fuse, not global-sort")
    // jaccard: the wedge join and both degree joins are equi-joins
    val jc = plan("q_graph_jaccard")
    assert(!jc.contains("CartesianProduct") &&
      !jc.contains("BroadcastNestedLoopJoin"))
    assert(jc.contains("TakeOrderedAndProject"))
    val tg = plan("q_event_trigrams")
    assert(tg.contains("Window") && tg.contains("TakeOrderedAndProject"))
  }

  test("layout family: z-order and rendezvous are narrow maps — no " +
      "exchange before the few-key final aggregation") {
    val z = plan("q_layout_zorder")
    val zread = z.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(zread.count(_ == ',') == 1,
      s"zorder must scan only (l_partkey, l_suppkey): $zread")
    // formatted mode prints each node once in the tree and once as a
    // "(n) Exchange" detail header — count the headers
    assert("""\(\d+\) Exchange""".r.findAllIn(z).size <= 2,
      "zorder: one agg exchange + one presentation sort only")
    val r = plan("q_shard_rendezvous")
    assert(!r.contains("Join"), "rendezvous must be per-row greatest()," +
      " not an explode+shuffle argmax")
    assert("""\(\d+\) Exchange""".r.findAllIn(r).size <= 2,
      "rendezvous: one agg exchange + one presentation sort only")
  }

  test("ks and feature-bins run their global window over the value " +
      "HISTOGRAM, not the corpus: partial agg precedes the window") {
    Seq("q_dq_ks", "q_feature_bins").foreach { n =>
      val p = plan(n)
      assert(p.contains("partial_"),
        s"$n: histogram agg must combine map-side")
      // the corpus-wide exchange is the histogram agg; the window's
      // single-partition exchange only ever sees histogram rows
      val aggIdx = p.indexOf("HashAggregate")
      val winIdx = p.indexOf("Window")
      assert(winIdx >= 0 && aggIdx >= 0,
        s"$n: expected aggregate + window in plan")
    }
  }

  test("chisq broadcasts all three marginals; pack-waste scans only " +
      "the text column") {
    val c = plan("q_dq_chisq")
    assert(c.contains("BroadcastHashJoin") && !c.contains("CartesianProduct"))
    val w = plan("q_pack_waste")
    val read = w.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains(","),
      s"pack-waste must read only documents.text: $read")
    assert("""\(\d+\) Exchange""".r.findAllIn(w).size <= 2,
      "pack-waste: one 5-key agg exchange + presentation sort only")
  }

  test("bpe family: every window partitions by word (no global " +
      "single-partition window), argmax pair is a 1-row broadcast") {
    Seq("q_bpe_merges", "q_bpe_encode").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n: cartesian")
      // the per-round merge pick crosses against a 1-row broadcast —
      // any other nested loop would be a degraded vocab join
      assert(p.contains("BroadcastExchange"),
        s"$n: merge argmax must broadcast")
      // every window spec must partition by word — a global window
      // would funnel the symbol table through one task
      val specs = "windowspecdefinition\\(\\w+".r.findAllIn(p).toSeq
      assert(specs.nonEmpty &&
        specs.forall(_ == "windowspecdefinition(word"),
        s"$n: non-word-partitioned window in ${specs.distinct}")
    }
  }

  test("benford is one 9-key aggregation with map-side combine over " +
      "a single-column pruned scan") {
    val p = plan("q_dq_benford")
    assert(p.contains("partial_count"))
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains(","),
      s"benford scan must read only l_extendedprice: $read")
  }

  test("communities and contrastive pairs: equi-joins only, no " +
      "all-pairs fallback") {
    for (n <- Seq("q_graph_communities", "q_pairs_contrastive")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$n must stay on hash/sort-merge equi-joins")
    }
  }

  test("skyline's doc-level dominance window is bucket-partitioned — " +
      "only the tiny bucket-suffix window is global") {
    val p = plan("q_curation_skyline")
    val specs = p.linesIterator
      .filter(_.contains("windowspecdefinition("))
      .map(_.trim.split("windowspecdefinition\\(")(1)
        .split(",")(0)).toSeq
    // exactly two windows: the per-bucket doc window (partitioned by
    // bkt) and the bucket-suffix window (ordered by bkt, global over
    // ~thousands of bucket rows)
    assert(specs.exists(_.startsWith("bkt")),
      s"doc-level window must partition by bkt: $specs")
  }

  test("m4 is one pure hash aggregation — struct-ordered extreme " +
      "points, no window, no sort before the shuffle") {
    val p = plan("q_ts_m4")
    // all four extreme points are associative struct-min/max, so the
    // whole operator is partial+final HashAggregate over one bucket
    // exchange (plus the presentation sort's range exchange)
    assert(!p.contains("Window"), "m4 must not plan a window")
    assert(!p.contains("Join"), "m4 must not join")
    assert(p.contains("partial_"), "m4 must combine map-side")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).size
    assert(exchanges <= 2, s"m4 should shuffle once + sort, saw $exchanges")
  }

  test("argmax family plans as pure hash aggregation — no window, " +
      "no per-partition sort") {
    for (n <- Seq("q_dedup_latest", "q_ts_ohlc", "q_ann_lsh",
        "q_ts_nearest_join", "q_ts_trend")) {
      val p = plan(n)
      assert(!p.contains("Window"),
        s"$n must resolve its extreme rows by struct-min/max, not a window")
      assert(p.contains("partial_"), s"$n must combine map-side")
    }
  }

  test("round-8 aggregation family: map-side partials everywhere, " +
      "no cartesian anywhere") {
    for (n <- Seq("q_quality_curve", "q_dq_kanon", "q_dq_skew",
        "q_dq_ab_lift", "q_dq_embeddings", "q_ts_rolling_hll",
        "q_graph_assortativity", "q_text_keyphrases",
        "q_ann_ivf_sweep", "q_ts_scd2")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n must not plan a cartesian product")
      assert(p.contains("partial_"), s"$n must combine map-side")
    }
  }

  test("hll registers fold map-side; bfs and vad stay on equi-joins") {
    val ph = plan("q_vocab_hll")
    assert(ph.contains("partial_"), "hll register fold must combine map-side")
    assert(!ph.contains("CartesianProduct"))
    for (n <- Seq("q_graph_bfs", "q_multimodal_audio_vad",
        "q_join_salted")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n must not plan a cartesian product")
    }
  }

  test("dsir weight lookup broadcasts the fixed bucket table; mrr " +
      "candidates come from the bucket equi-join") {
    val pd = plan("q_curation_dsir")
    assert(pd.contains("BroadcastHashJoin"),
      "the 128-row weight table must broadcast to the corpus scan")
    assert(!pd.contains("CartesianProduct"))
    assert(pd.contains("partial_"), "bucket counts must combine map-side")
    val pm = plan("q_ann_mrr")
    assert(!pm.contains("CartesianProduct") &&
      !pm.contains("BroadcastNestedLoopJoin"),
      "mrr retrieval must stay on the bucket equi-join")
  }

  test("native interval join plans the custom sweep operator with " +
      "key-clustered exchanges") {
    val df = SparkEntry.queries("q_ts_interval_native")(
      SparkFixture.spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin "),
      "the custom IntervalJoinExec must plan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ttl dedup is one window pass, join-free; curriculum scan " +
      "prunes to the two text-derived columns; clustering coefficient " +
      "stays on the wedge equi-join") {
    val pt = plan("q_dedup_ttl")
    assert(!pt.contains("Join"),
      "gap-island dedup must be one window per key, no joins")
    assert("Window".r.findAllIn(pt).size >= 1 && pt.contains("partial_"),
      "per-key window + map-side combined aggregate expected")
    val pc = plan("q_curation_curriculum")
    val read = pc.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      read.count(_ == ',') < 3,
      s"curriculum must scan only doc_id+text: $read")
    val pg = plan("q_graph_clustering_coeff")
    assert(!pg.contains("CartesianProduct") &&
      !pg.contains("BroadcastNestedLoopJoin"),
      "corner counting must not break the equi-join wedge shape")
    assert(pg.contains("TakeOrderedAndProject"),
      "top-20 must fuse, not global-sort")
  }

  test("iterative graph queries keep their lineage cut: the cached " +
      "edge list bounds parquet scans per plan") {
    // before the coPurchaseSupported/tradeEdges cache, the unrolled
    // iterations re-derived the lineitem self-join per reference —
    // 132 scans in pagerank's plan, 120 in modularity's, 1.3 GB of
    // shuffle at the 10x smoke
    // count actual file-scan leaves; "Scan parquet" would also match
    // the cached subtree the formatted mode prints under every
    // InMemoryRelation reference
    Seq("q_graph_pagerank" -> 8, "q_graph_modularity" -> 4,
      "q_graph_jaccard" -> 4, "q_graph_clustering_coeff" -> 4,
      "q_graph_communities" -> 4).foreach { case (q, bound) =>
      val n = "Location: InMemoryFileIndex".r.findAllIn(plan(q)).size
      assert(n <= bound,
        s"$q plans $n parquet scans (bound $bound) — lineage cut lost")
    }
  }

  test("hybrid retrieval fuses both ranker legs to TakeOrdered and " +
      "broadcasts the query vector") {
    val p = plan("q_ann_hybrid")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 3,
      "each leg's top-100 and the final top-15 must fuse, not sort")
    assert(p.contains("BroadcastExchange"),
      "the 1-row query vector must broadcast")
    // the explicit 1-row cross joins are broadcast-sized by
    // construction; what must NOT appear is a shuffled global sort
    // feeding the final fusion
    assert(!p.contains("rangepartitioning(rrf"),
      "final top-15 must be TakeOrdered, not a range-partitioned sort")
  }

  test("label purity never joins per-vector rows: the majority join " +
      "runs on (bucket,label) aggregates, map-side combined") {
    val p = plan("q_embed_label_purity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_"),
      "(bucket,label) counts must combine map-side")
    // the signature map reads only embedding+label from the scan
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains("vec_id"),
      s"audit must not read vec_id: $read")
  }

  test("round-9 shapes hold: curriculum ranks via range partitioning " +
      "(no corpus-wide ntile window), quantile sample pre-prunes with " +
      "WindowGroupLimit, image band join stays an equi-join") {
    val pc = plan("q_curation_curriculum")
    assert(!pc.toLowerCase.contains("ntile"),
      "curriculum must not plan the single-partition global NTILE")
    assert(pc.toLowerCase.contains("rangepartitioning"),
      "the two-pass rank must range-repartition on the sort key")
    assert(pc.contains("BroadcastHashJoin") ||
      pc.contains("BroadcastExchange"),
      "the <=32-row offset table must broadcast back to the ranks")
    val pq = plan("q_dq_quantile_sample")
    assert(pq.contains("WindowGroupLimit"),
      "bottom-64 must pre-prune each partition before the exchange")
    val pi = plan("q_multimodal_image_pairs")
    assert(!pi.contains("CartesianProduct") &&
      !pi.contains("BroadcastNestedLoopJoin"),
      "banded hamming candidates must come from a hash/merge equi-join")
    assert(pi.contains("TakeOrderedAndProject"),
      "top-20 closest pairs must fuse, not global-sort")
  }

  test("round-10 shapes: imagehash-recall truth side broadcasts the " +
      "anchor sample; ANN serving scans only the probed cell " +
      "partitions") {
    val pr = plan("q_multimodal_imagehash_recall")
    // anchored exhaustive truth = corpus × BROADCAST anchors (n/16
    // rows) — a shuffled or sort-merge truth join would shuffle the
    // whole corpus per evaluation
    assert(pr.contains("BroadcastNestedLoopJoin") &&
      pr.contains("Cross"),
      "anchor truth must be a Cross broadcast nested loop, " +
        s"not a shuffle: ${pr.take(400)}")
    assert(!pr.contains("CartesianProduct"),
      "anchored truth must never plan a cartesian product")
    // the candidate side stays the banded equi-join
    assert(pr.contains("SortMergeJoin") || pr.contains("ShuffledHashJoin")
      || pr.contains("BroadcastHashJoin"),
      "found-join must be a hash/merge equi-join")

    // ANN serving: the cells scan must partition-prune to the probed
    // cells (the K/nprobe promise) — assert on the actual plan of a
    // store query against a just-built index
    val spark = SparkFixture.spark
    val tierDir = java.nio.file.Files
      .createTempDirectory("ann-plan-tier").toFile
    val store = new graft.engine.AnnStore(spark,
      new graft.tier.ParquetTier(tierDir))
    store.build("planpin", dir)
    // versioned layout (round 13): artifacts live in the version dir
    // the CURRENT pointer names
    val idxRoot = new java.io.File(tierDir, "_ann/planpin")
    val ver = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(idxRoot, "CURRENT").toPath), "UTF-8").trim
    val cellsPath = new java.io.File(new java.io.File(idxRoot, ver),
      "cells.parquet").getPath
    val probed = spark.read.parquet(cellsPath)
      .filter(org.apache.spark.sql.functions.col("cell").isin(1, 2, 3))
    val exec = probed.queryExecution.executedPlan
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "cell filter must reach the scan as a PARTITION filter " +
        "(cells.parquet is partitioned by cell)")
    val probedParts = scans.head.selectedPartitions.partitionCount
    val allParts = spark.read.parquet(cellsPath)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head.selectedPartitions.partitionCount
    assert(probedParts < allParts,
      s"probing 3 of 8 cells must select fewer partition dirs " +
        s"($probedParts vs $allParts)")
  }

  test("round-10 late batch shapes: bloom/ood broadcast their tiny " +
      "sides, cdc chunks without a window, url never explodes, " +
      "ppr/hardneg stay on equi-joins") {
    // bloom: the 4096-word bitmap broadcasts to the probe side; the
    // probe never shuffles against history except in the exact AUDIT
    // join — and nothing plans a cartesian
    val pb = plan("q_dedup_bloom")
    assert(pb.contains("BroadcastHashJoin"),
      "bloom bitmap must broadcast to the probe side")
    assert(!pb.contains("CartesianProduct"))

    // ood: label stats (|labels|×64 rows → arrays) broadcast; the
    // sufficient-stat aggregation is two-phase
    val po = plan("q_embed_ood")
    assert(po.contains("BroadcastHashJoin"),
      "μ/σ² arrays must broadcast to the scoring map")
    assert(po.contains("partial_"),
      "sufficient stats must aggregate map-side first")

    // cdc: chunking is array-native — no token explode through a
    // window; the only Generate is the CHUNK explode and there is no
    // Window operator at all
    val pc = plan("q_dedup_cdc")
    assert(!pc.contains("Window"),
      "cdc must not window exploded tokens (the pre-rewrite shape)")
    assert(pc.contains("Generate"), "chunk explode missing")
    assert(pc.contains("partial_"))

    // url: one narrow projection per doc — no explode anywhere, and
    // the audit tail fuses to TakeOrdered
    val pu = plan("q_dedup_url")
    assert(!pu.contains("Generate"),
      "url canonicalization must stay row-narrow (no explode)")
    assert(pu.contains("TakeOrderedAndProject"))

    // ppr: seed table broadcast, all rank rounds equi-joins
    val pp = plan("q_graph_ppr")
    assert(pp.contains("BroadcastHashJoin"))
    assert(!pp.contains("CartesianProduct"))

    // hardneg: candidate machinery + labeled vector joins stay on
    // hash/merge equi-joins; no cartesian anywhere
    val ph = plan("q_pairs_hardneg")
    assert(!ph.contains("CartesianProduct"))
    assert(!ph.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin")),
      "hardneg must not degrade to a nested-loop join")

    // changepoint: events contract through one scan; the window runs
    // over the contracted (type, day) rows only, after a two-phase agg
    val pt = plan("q_ts_changepoint")
    // FormattedMode prints each scan twice (tree + details): one
    // physical scan leaf = 2 occurrences
    assert("Scan parquet".r.findAllIn(pt).size <= 2,
      "changepoint must read events exactly once")
    assert(pt.contains("partial_") && pt.contains("Window"))
  }
}
