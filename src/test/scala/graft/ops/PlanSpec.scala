package graft.ops

import graft.SparkSpec

/** Physical-plan shape assertions — the scale contract, enforced as tests.
  * These lock in what `.explain("formatted")` review established: filters
  * and projections reach the parquet scan, small dims broadcast, top-k
  * never globally sorts the input, and signature stages stay shuffle-free.
  * A regression here is a 100TB regression even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_lineitem: filter and projection are pushed to the parquet scan") {
    val p = plan(Relational.scanLineitem(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"))
  }

  test("sql_q6: every predicate reaches the scan; only the needed columns read") {
    // the default 100-char metadata truncation cuts the PushedFilters
    // list mid-token — widen it for THIS assertion only
    val key = "spark.sql.maxMetadataStringLength"
    val old = spark.conf.get(key)
    spark.conf.set(key, "2000")
    try {
      val p = plan(Relational.sqlQ6(spark, dir))
      Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)").foreach { f =>
        assert(p.contains(f), s"predicate not pushed: $f\n$p")
      }
      assert(p.contains("ReadSchema: struct<l_quantity:double," +
        "l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
        s"scan reads more than the query needs:\n$p")
    } finally spark.conf.set(key, old)
  }

  test("join_broadcast: dims are broadcast, fact side never shuffles for the join") {
    val p = plan(Relational.joinBroadcast(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("topk: TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.topk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("agg_by_key: partial aggregation before the exchange (map-side combine)") {
    val p = plan(Relational.aggByKey(spark, dir))
    val partial = p.indexOf("partial_sum")
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(partial >= 0 && exchange >= 0)
    // toString prints top-down: the final agg and exchange appear before
    // (above) the partial agg, i.e. partial runs below the shuffle
    assert(exchange < partial)
  }

  test("minhash signatures: no exchange before the band join (map-side sigs)") {
    // the signature pipeline (scan -> tokens -> hashes -> sigs -> bands)
    // must contain no shuffle; the first Exchange belongs to the band join
    val p = plan(DedupOps.dedupMinhash(spark, dir))
    val generate = p.indexOf("Generate explode")   // band explode, map-side
    val firstExchange = p.indexOf("Exchange")
    assert(generate >= 0)
    assert(firstExchange < generate,
      "band explode should sit above the only exchange (the join shuffle)")
  }

  test("sim_topk: query side is broadcast") {
    val p = plan(VectorOps.simTopk(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("winfn_rank: bounded-heap aggregate, the full input is never sorted") {
    // aggregation-shaped top-k: the table flows into an ObjectHashAggregate
    // running the custom TopKStructs bounded heap (map-side partial below
    // the exchange), and the only Sort/Window in the plan operate on the
    // ≤3-per-flag survivor set ABOVE the aggregate — the fact table itself
    // is never sorted.
    val p = plan(Relational.winfnRank(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"expected the typed aggregate:\n$p")
    assert(p.contains("partial_top_k_structs"), s"expected map-side partials:\n$p")
    assert("Window ".r.findAllMatchIn(p).size == 1, s"one tiny window only:\n$p")
    // top-down toString: every Sort and the Window must appear BEFORE (above)
    // the aggregate that bounds the data, i.e. they never touch the scan side
    val aggPos = p.indexOf("ObjectHashAggregate")
    val sortPositions = "Sort ".r.findAllMatchIn(p).map(_.start).toSeq
    assert(sortPositions.forall(_ < aggPos),
      s"a Sort runs below the aggregate (over the full input):\n$p")
  }

  test("union_all: exactly one file scan (isin, not N scan branches)") {
    val p = plan(Relational.unionAllStreams(spark, dir))
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected a single parquet scan, found $scans:\n$p")
  }

  test("sim_ann_topk: query side broadcast, no cartesian candidate generation") {
    val p = plan(VectorOps.simAnnTopk(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"banded candidates must come from an equality join vs broadcast queries:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ANN candidate generation must never be all-pairs:\n$p")
  }

  test("sample_stratified: map-side only — no hash shuffle before the output sort") {
    val p = plan(Curation.sampleStratified(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash-mod sampling must not shuffle:\n$p")
  }

  test("mm_frame_sample: the frame explode runs map-side (no exchange below it)") {
    val p = plan(graft.ops.Multimodal.mmFrameSample(spark, dir))
    val generate = p.indexOf("Generate explode")
    val exchange = p.indexOf("Exchange")
    assert(generate >= 0)
    // toString is top-down: an exchange below the generate would print after
    assert(exchange < 0 || exchange < generate,
      s"explode must not sit above a shuffle:\n$p")
  }

  test("curate_corpus: two corpus scans, keep-lists broadcast by AQE at runtime") {
    // the curation query's scale contract: documents is scanned once for the
    // fused quality gate and once for the exact-dedup hash agg — never a
    // third time for the cluster keep-list, which must arrive as a
    // checkpoint-backed RDD (the LSH+verify+label pipeline ran once at
    // construction). The lists carry no plan-time stats, so the broadcast
    // decision is AQE's from runtime sizes — assert the FINAL adaptive plan
    // (a static hint would be wrong for a dup-heavy corpus whose drop-list
    // is too big to broadcast).
    val df = Curation.curateCorpus(spark, dir)
    df.collect() // drive AQE to its final plan
    val whole = plan(df)
    assert(whole.contains("isFinalPlan=true"), "AQE final plan not reached")
    val p = whole.split("== Initial Plan ==").head // assert on the final section only
    assert("Scan parquet".r.findAllMatchIn(p).size == 2, s"expected 2 scans:\n$p")
    assert(p.contains("Scan ExistingRDD"), "cluster drop-list is not checkpoint-backed")
    assert(!p.toLowerCase.contains("levenshtein"), "dedup subtree re-planned inline")
    assert(p.contains("BroadcastHashJoin"), "small keep-lists should broadcast at runtime")
    assert(!p.contains("SortMergeJoin"), "corpus side must not sort-merge at this scale")
  }

  test("pq_days: readback prunes to the filtered week") {
    // the write side produced day=... directories; the readback filter must
    // arrive as PartitionFilters on the scan (7 of 30 partitions touched),
    // never as a post-scan Filter over all partitions
    val p = plan(Formats.sinkParquetPartitioned(spark, dir))
    assert(p.contains("PartitionFilters:"), s"no partition filters:\n$p")
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined,
      s"day range not pushed into partition pruning:\n$p")
  }

  test("sink_orc: readback pushes the returnflag predicate into ORC") {
    val p = plan(Formats.sinkOrcRoundtrip(spark, dir))
    assert(p.contains("Scan orc"), s"expected an ORC scan:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(p).isDefined,
      s"returnflag predicate not pushed to the ORC reader:\n$p")
  }

  test("dedup_vec: banded candidates from an equality join, never all-pairs") {
    val p = plan(VectorOps.dedupEmbedding(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup candidate generation must never be all-pairs:\n$p")
  }

  test("text dedups: the corpus is tokenized/signed exactly once per query") {
    // the text dedup ops materialize their signature frames
    // (localCheckpoint), so the final plan replays NO tokenize/signature
    // subtree: self-join sides and aggregate branches read the materialized
    // blocks. Plan-probed without the checkpoints: 2-3 full corpus scans
    // per query (AQE's broadcast conversion defeats exchange reuse between
    // branches). The embedding ops are deliberately NOT checkpointed —
    // their shared frame carries the raw vector column, and two pruned
    // columnar scans beat spilling the vectors to executor storage (see
    // VectorOps.simAnnTopk) — so they are asserted at their planned scan
    // counts instead. dedup_verify's residual scan is the
    // 2-column text prefix frame (its second use deduped by reuse).
    def finalScans(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val whole = plan(df)
      assert(whole.contains("isFinalPlan=true") || !whole.contains("AdaptiveSparkPlan"))
      "Scan parquet".r.findAllMatchIn(whole.split("== Initial Plan ==").head).size
    }
    assert(finalScans(DedupOps.dedupNgramJaccard(spark, dir)) == 0)
    assert(finalScans(DedupOps.dedupMinhash(spark, dir)) == 0)
    assert(finalScans(DedupOps.dedupSimhash(spark, dir)) == 0)
    assert(finalScans(Extended.dedupVerifyEditdist(spark, dir)) <= 1)
    assert(finalScans(VectorOps.simAnnTopk(spark, dir)) <= 2)
    assert(finalScans(VectorOps.dedupEmbedding(spark, dir)) <= 3)
  }

  test("text_tfidf: one tokenize pass; top-3 bounded before the doc shuffle") {
    // the (doc, token) tf frame must be checkpoint-backed and feed both the
    // df aggregate and the probe side — without the materialization the
    // tokenize+aggregate subtree plans twice (two full corpus passes; AQE's
    // broadcast conversion defeats exchange reuse). The only parquet scan
    // left in the final plan is the column-pruned N count. Spark 4's
    // WindowGroupLimit must bound the per-doc top-3 below the shuffle.
    val df = TextOps.textTfidf(spark, dir)
    df.collect() // drive AQE to the final plan
    val whole = plan(df)
    assert(whole.contains("isFinalPlan=true"))
    val p = whole.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"expected 1 scan:\n$p")
    assert(p.contains("Scan ExistingRDD"), "tf frame is not checkpoint-backed")
    assert(p.contains("WindowGroupLimit"), "top-3 not bounded before the window")
  }

  test("text_ppl: one tokenize pass; vocab and N broadcast onto the tf grain") {
    // same materialize-once contract as text_tfidf: the (doc, token, tf)
    // frame is checkpoint-backed and feeds vocab, N, and the probe side —
    // the final plan holds zero parquet scans (everything derives from the
    // one materialized tokenize) and the scoring joins are broadcasts, so
    // the per-doc aggregation is the only hash exchange.
    val df = TextOps.textPpl(spark, dir)
    df.collect()
    val whole = plan(df)
    val p = whole.split("== Initial Plan ==").head
    assert(!p.contains("Scan parquet"), s"expected no parquet scan:\n$p")
    assert(p.contains("Scan ExistingRDD"), "tf frame is not checkpoint-backed")
    assert(p.contains("BroadcastHashJoin"), "vocab join must broadcast")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge join expected:\n$p")
  }

  test("sim_kmeans: centroids broadcast in both passes, argmax partial-aggregated") {
    // Lloyd at scale = broadcast-assign + tree-aggregate: both assignment
    // joins must be broadcast nested-loop joins of a K-row side (never a
    // shuffle of the corpus against centroids), and the per-vector argmax
    // must have a partial_max_by below its exchange so the shuffle carries
    // one row per vector, not one per (vector, centroid).
    val p = plan(VectorOps.simKmeans(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroids must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join expected:\n$p")
    assert(p.contains("partial_max_by"), s"argmax must map-side combine:\n$p")
  }

  test("win_range: one user-keyed exchange; the range frame never single-partitions") {
    val p = plan(Extended.winfnRange(spark, dir))
    assert(p.contains("Exchange hashpartitioning(user_id"),
      s"range window must key on user_id:\n$p")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"a single-partition window would serialize the table:\n$p")
  }

  test("zorder: interleave is map-side, aggregate has partials below the exchange") {
    val p = plan(Extended.zorder(spark, dir))
    val partial = p.indexOf("partial_count")
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(partial >= 0 && exchange >= 0 && exchange < partial,
      s"z-bucket agg must map-side combine:\n$p")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      s"scan must prune to the two z columns:\n$p")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    // the OTHER half of the skew story next to join_salt's manual salting:
    // when a hot key concentrates a shuffle partition, AQE's runtime
    // statistics split it into parallel sub-partitions with no query
    // rewrite. Thresholds are lowered so the fixture-scale hot key (50k of
    // 51k rows on key 0) trips the same OptimizeSkewedJoin rule a 100 TB
    // skew would.
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(51000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pad"))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 7).as("v"))
      val joined = fact.join(dim, "k")
      // drive THIS dataframe so its adaptive plan finalizes (count() would
      // execute a different query); only the hot key 0 exists in dim
      assert(joined.collect().length == 50000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join_asof: linear union + running last, no per-event candidate fanout") {
    val p = plan(Relational.joinAsof(spark, dir))
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("last("), s"expected running last_value:\n$p")
  }

  test("candles: packed ordering key keeps min_by/max_by in HashAggregate") {
    // the whole point of the BIGINT-packed (µs-in-hour, id) ordering key:
    // a struct key forces SortAggregate (per-partition O(n log n) sort of
    // the event stream); the packed long keeps the buffer fixed-width so
    // both partial and final aggregates hash
    val p = plan(TimeWindows.candles(spark, dir))
    assert(p.contains("partial_min_by"), s"expected map-side min_by partials:\n$p")
    assert(!p.contains("SortAggregate"),
      s"candles must hash-aggregate, not sort-aggregate:\n$p")
  }

  test("chunks: map-side explode only — no shuffle before the output sort") {
    val p = plan(TextOps.textChunks(spark, dir))
    assert(p.contains("Generate explode(sequence"), s"expected chunk explode:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size <= 1, s"one corpus scan:\n$p")
  }

  test("colloc: unigram counts materialized once — final plan scans the corpus once") {
    val p = plan(TextOps.textColloc(spark, dir))
    assert("Scan parquet".r.findAllMatchIn(p).size == 1,
      s"only the bigram pass may scan the corpus (unigrams are checkpointed):\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded take, not a global sort:\n$p")
  }

  test("pack_seq: running sum partitioned by shard, never a global window") {
    val p = plan(Curation.packSequences(spark, dir))
    assert(p.contains("Exchange hashpartitioning(shard"),
      s"window must shuffle on shard (the parallelism unit):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"a single-partition window would serialize the corpus:\n$p")
  }

  test("join_salt: shuffled-hash on (key, salt) with the dim side exploded") {
    val p = plan(Relational.joinSalted(spark, dir))
    assert(p.contains("ShuffledHashJoin"),
      s"the hint must hold (broadcast would hide the salting):\n$p")
    assert(p.contains("Generate explode"), s"dim side must explode per salt:\n$p")
    assert("hashpartitioning\\(l_suppkey[^)]*salt".r.findFirstIn(p).isDefined,
      s"fact shuffle must key on (suppkey, salt):\n$p")
  }

  test("upsert: anti-join decomposition — the base table never shuffles") {
    // the naive MERGE (full outer on the key) sort-merges BOTH sides; the
    // decomposed form keeps every untouched base row via a broadcast anti
    // join, so no hash exchange may appear on the base branch
    val p = plan(Relational.upsert(spark, dir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"change keys must broadcast into an anti join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("FullOuter"),
      s"the full-outer encoding shuffles the base at any scale:\n$p")
  }

  test("candles_daily: both aggregation levels stay hash — rollup never sorts") {
    // the daily min_by/max_by order by an INT hour-of-day key; the string
    // hour key would push the rollup level into SortAggregate (observed)
    val p = plan(TimeWindows.candlesDaily(spark, dir))
    assert(!p.contains("SortAggregate"),
      s"rollup must hash-aggregate at both levels:\n$p")
    assert(p.contains("partial_min_by"), s"expected map-side partials:\n$p")
  }

  test("sample_group: bounded heap per group — groups are never sorted") {
    // exact-k per-domain cap: map-side partial TopKStructs heaps, shuffle
    // carries ≤ k rows per (group, task); a row_number window formulation
    // would sort whole groups inside #groups reducers
    val p = plan(Curation.sampleGroup(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"expected the typed aggregate:\n$p")
    assert(p.contains("partial_top_k_structs"), s"expected map-side partials:\n$p")
    assert(!p.contains("Window"), s"no window machinery over full groups:\n$p")
  }

  test("join_bloom: runtime bloom filter prunes the probe side before the shuffle") {
    // the injected semi-join filter must reach the fact side as a
    // might_contain predicate — rows that cannot match are dropped before
    // paying the exchange (the big-big join shape at 100 TB)
    val df = Relational.joinBloom(spark, dir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"expected an injected runtime bloom filter on the probe side:\n$opt")
    assert(df.queryExecution.executedPlan.toString.contains("SortMergeJoin")
      || df.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "the conf-pinned session must plan the shuffle-join regime")
  }

  test("upsert_scd2: history merge is one broadcast left join — base never shuffles") {
    // close-or-keep classification of every base row must come from ONE
    // broadcast left join (the change batch is tiny by definition); a
    // sort-merge or a hash exchange on the base branch is the
    // full-outer-shaped plan this op exists to avoid
    val p = plan(Relational.upsertScd2(spark, dir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"change batch must broadcast into a left join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("FullOuter"),
      s"base must not shuffle for the merge:\n$p")
  }

  test("bpe: bounded top-k over a map-side-combined pair count, one scan") {
    val p = plan(TextOps.textBpe(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must be bounded:\n$p")
    assert(p.contains("partial_count"), s"pair count must combine map-side:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"one corpus scan:\n$p")
  }

  test("invidx: postings built by hash aggregation, the corpus is never sorted") {
    val p = plan(TextOps.invIndex(spark, dir))
    assert(p.contains("partial_collect_list"),
      s"posting lists must combine map-side:\n$p")
    assert(!p.contains("SortAggregate"),
      s"index build must stay in hash aggregation (sort_array is per-row):\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"one corpus scan:\n$p")
  }

  test("zscore: stats broadcast back — the event stream itself never hash-shuffles") {
    val p = plan(Relational.anomalyZscore(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"stats side must broadcast:\n$p")
    // the only hash exchange belongs to the tiny stats aggregate (below the
    // BroadcastExchange); the probe side reads the scan directly
    val probe = p.substring(0, p.indexOf("BroadcastExchange"))
    assert(!probe.contains("Exchange hashpartitioning"),
      s"probe side must not shuffle before the join:\n$p")
  }

  test("agg_percentile_approx: sketch state merges across partitions, no sort") {
    // the whole point vs the exact form: per-group state is a bounded GK
    // summary combined map-side, never a materialize-and-sort of the group
    val p = plan(Extended.aggPercentileApprox(spark, dir))
    assert(p.contains("partial_approx_percentile"),
      s"sketch must partial-aggregate below the exchange:\n$p")
    assert(!p.contains("SortAggregate"),
      s"approx percentile must not fall back to sort aggregation:\n$p")
  }

  test("invidx_seg: same hash-aggregated build as the canonical index") {
    val p = plan(TextOps.invIndexSeg(spark, dir))
    assert(p.contains("partial_collect_list"),
      s"segment posting lists must combine map-side:\n$p")
    assert(!p.contains("SortAggregate"),
      s"segmented build must stay in hash aggregation:\n$p")
    assert("Scan parquet".r.findAllMatchIn(p).size == 1, s"one corpus scan:\n$p")
  }

  test("zorder_wide: range bounds broadcast; bucketing never sorts globally") {
    val p = plan(Extended.zorderWide(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the one-row (min,max) frame must broadcast onto the scan:\n$p")
    // bucket assignment is map-side arithmetic — the only Sort is the
    // 256-row presentation ORDER BY, never a sort of the corpus (a global
    // ntile formulation would show a SinglePartition window here)
    assert(!p.contains("Window"), s"no window/ntile machinery:\n$p")
  }

  test("dedup_substr: gram join from the materialized frame; islands never single-partition") {
    val p = plan(DedupOps.dedupSubstring(spark, dir))
    assert("Scan parquet".r.findAllMatchIn(p).isEmpty,
      s"both join sides must replan from the materialized gram frame:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the keyed gram-hash join:\n$p")
    // the islands window keys on (a, b, d) — a run is bounded by the
    // shorter document, so no reducer concentrates
    assert(!p.contains("Window [") || !p.contains("SinglePartition"),
      s"islands window must partition by (a,b,d):\n$p")
  }

  test("vec_rp: projection is map-side codegen — no shuffle before the output sort") {
    // the JL matrix folds into the plan as literals; each output dim is
    // one fused dot_product pass — a shuffle or a SortAggregate here means
    // the projection stopped being a pure map stage
    val p = plan(VectorOps.vecRandomProjection(spark, dir))
    assert(p.contains("dot_product"), s"expected fused dot_product terms:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"projection must not shuffle (only the ORDER BY range exchange):\n$p")
    assert(!p.contains("SortAggregate") && !p.contains("HashAggregate"),
      s"projection has no aggregation at all:\n$p")
  }

  test("dedup_incr: stored band index is bucketed — probes shuffle ONLY the delta") {
    // the 100 TB daily-dedup plan: the stored (band, sig, doc_id) index is
    // a catalog table bucketed on the probe key, so it arrives at the
    // probe join already hash-partitioned — the join's only Exchange is on
    // the delta side. AQE/broadcast are pinned off so the co-located
    // sort-merge shape is the one asserted (broadcast would trivially hide
    // the stored side's partitioning on a fixture-sized delta).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val exec = DedupOps.dedupIncremental(spark, dir).queryExecution.executedPlan
      val p = exec.toString
      // the ONLY parquet scan is the stored index (the corpus is never
      // rescanned — signatures replan from the materialized band frame),
      // and it reads bucket-aware
      assert("Scan parquet".r.findAllMatchIn(p).size == 1,
        s"exactly one parquet scan (the stored index):\n$p")
      assert(p.contains("band_idx"), s"the parquet scan must be the index:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"stored index must be read as a bucketed scan:\n$p")
      assert(p.contains("Scan ExistingRDD"),
        s"delta side must replan from the materialized band frame:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"candidates must come from keyed equality joins:\n$p")
      // structural lock: no ShuffleExchange anywhere between the stored
      // scan and the probe join that consumes it
      def stored(n: SparkPlan): Boolean = n.collectLeaves().exists {
        case s: FileSourceScanExec => s.tableIdentifier.exists(_.table == "band_idx")
        case _ => false
      }
      val probes = exec.collect {
        case j: SortMergeJoinExec if stored(j) => j: SparkPlan
        case j: ShuffledHashJoinExec if stored(j) => j: SparkPlan
      }
      assert(probes.nonEmpty, s"expected a probe join over the stored index:\n$p")
      probes.foreach { j =>
        val storedChildren = j.children.filter(stored)
        assert(storedChildren.nonEmpty, s"stored side lost under $j:\n$p")
        storedChildren.foreach { c =>
          assert(c.collect { case e: ShuffleExchangeExec => e }.isEmpty,
            s"stored side must arrive pre-partitioned — zero Exchange:\n$p")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("join_fuzzy: q-gram blocking keeps the pairwise compare out of a cartesian") {
    val p = plan(Relational.joinFuzzy(spark, dir))
    // the candidate generator is an EQUI join on the exploded bigram — an
    // all-pairs levenshtein would surface as CartesianProduct/BNLJ
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to all-pairs:\n$p")
    // the verify predicate runs post-join on candidates only
    assert(p.contains("levenshtein"), s"missing the verify stage:\n$p")
  }

  test("funnel: per-step filters are pushed to the parquet scan") {
    val p = plan(EventOps.funnel(spark, dir))
    // each funnel step reads only its event_type slice — three scans, each
    // with the step's equality pushed down
    assert(p.contains("EqualTo(event_type,signup)"), s"step-1 filter not pushed:\n$p")
    assert(p.contains("EqualTo(event_type,view)"), s"step-2 filter not pushed:\n$p")
    assert(p.contains("EqualTo(event_type,purchase)"), s"step-3 filter not pushed:\n$p")
  }

  test("star_q5: dims broadcast, lineitem pruned to 4 columns, partial agg") {
    val p = plan(Relational.starRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    // fact-side scan reads only the join keys + revenue inputs
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint," +
      "l_extendedprice:double,l_discount:double>"),
      s"lineitem scan not pruned:\n$p")
    // aggregation is map-side partial before the exchange
    assert(p.contains("partial_count") || p.contains("partial"),
      "no partial aggregation in the star plan")
  }
}
