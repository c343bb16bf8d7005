package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality audit gate — the conformance checks an ingest pipeline runs
  * before publishing a snapshot (and fails the publish when violations
  * exceed budget): referential orphans, null rates on required columns,
  * domain-range violations, and primary-key duplicates. The reference's
  * analog is its per-row try/except tolerance — the adapters swallow
  * malformed frames row by row (liq-stream `adapters/binance_adapter.py:93-94`,
  * `adapters/hyperliquid_adapter.py:167-170`) and the CSV writer silently
  * drops unknown keys (`writer_csv.py:36`); this op turns those silent
  * drops into MEASURED counts a gate can threshold.
  *
  * Scale shape: each check is an independent aggregate over one scan —
  * count-shaped (map-side partials, a one-row result); the orphan check is
  * a keyed anti-join with no broadcast hint (both sides are fact-sized at
  * scale — AQE picks broadcast when the key side is actually small); the
  * final frame is a 5-row union of one-row aggregates. At 100 TB the checks share the snapshot scan via
  * the usual multi-aggregate rewrite if co-scheduled; they are expressed
  * independently here so each stays individually pruneable. */
object DataQuality {

  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val ev = table(spark, dir, "events")
    def check(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), count(lit(1)).as("violations"))
    // no broadcast hint: o_orderkey scales with the snapshot (orders is a
    // fact table, not a bounded dim) — a forced hint would encode an OOM
    // at 100 TB; AQE converts to broadcast at fixture scale on its own
    // (the dedupNgramJaccard rationale)
    val orphans = li.select("l_orderkey")
      .join(ord.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val nullValues = ev.filter(col("value").isNull)
    val nonPositiveQty = li.filter(col("l_quantity") <= 0.0)
    val tsOutOfRange = ev.filter(
      col("ts") < to_timestamp(lit("2020-01-01 00:00:00")) ||
        col("ts") >= to_timestamp(lit("2030-01-01 00:00:00")))
    // duplicate PKs: total minus distinct — 0 iff o_orderkey is unique
    val dupPk = ord.agg(
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("violations"))
      .select(lit("orders_dup_pk").as("check"), col("violations"))
    check("lineitem_orphan_orderkey", orphans)
      .unionByName(check("events_null_value", nullValues))
      .unionByName(check("lineitem_nonpositive_qty", nonPositiveQty))
      .unionByName(check("events_ts_out_of_range", tsOutOfRange))
      .unionByName(dupPk)
      .orderBy("check")
  }

  /** JOIN-KEY SKEW audit — the "do I need to salt this join?" diagnostic,
    * run BEFORE the 100 TB job instead of discovered from its straggler:
    * for each candidate shuffle key, the row count, distinct-key count,
    * and the share (permille, integer-exact) of the hottest 1 and hottest
    * 10 keys. A `skewed` flag fires when the top key carries >10× its
    * fair share (top1·n_keys > 10·n_rows) — the threshold at which
    * [[Relational.joinSalted]]'s salting or AQE skew-join splitting pays
    * for itself. Per key this is one keyed count (map-side partials) plus
    * two one-row reductions over the count frame — the count frame, not
    * the data, is everything downstream, so the audit costs one scan per
    * key column. The top-10 sum is well-defined under ties (any tie-break
    * at the boundary picks an equal count, so the SUM is unique) — that
    * is what makes it oracle-checkable where a "top-10 list" would not
    * be. The one-row stats⋈top10 cross joins are bounded frames (the
    * zscore/ppl pattern, PlanAudit-allowlisted). */
  def dqSkew(spark: SparkSession, dir: String): DataFrame = {
    def skewOf(df: DataFrame, tag: String, key: String): DataFrame = {
      val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      val stats = counts.agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"), max(col("c")).as("top1"))
      val top10 = counts.orderBy(col("c").desc, col("k"))
        .limit(10).agg(sum(col("c")).as("top10"))
      stats.crossJoin(top10).select(lit(tag).as("key_col"),
        col("n_rows"), col("n_keys"),
        expr("top1 * 1000 div n_rows").as("top1_permille"),
        expr("top10 * 1000 div n_rows").as("top10_permille"),
        expr("CAST(top1 * n_keys > 10 * n_rows AS INT)").as("skewed"))
    }
    skewOf(table(spark, dir, "lineitem"), "lineitem.l_orderkey", "l_orderkey")
      .unionByName(skewOf(table(spark, dir, "orders"),
        "orders.o_custkey", "o_custkey"))
      .unionByName(skewOf(table(spark, dir, "events"),
        "events.user_id", "user_id"))
      .unionByName(skewOf(table(spark, dir, "events"),
        "events.event_type", "event_type"))
      .orderBy("key_col")
  }

  /** ANALYZE TABLE — the stats-collection verb behind every cost-based
    * decision the rest of this library leans on (broadcast-vs-shuffle,
    * join order, AQE thresholds): per column, the distinct-value count,
    * null count, and numeric min/max, emitted one row per column from a
    * SINGLE pass over the table (the per-column frame is assembled with
    * one multi-aggregate and exploded — never a scan per column).
    * Exact `count_distinct` here because ANALYZE runs rarely and the
    * oracle must match; the Spark plan pays one expand for the multiple
    * distincts — at 100 TB you would flip the ndv aggregates to
    * `approx_count_distinct` (one pass, no expand, the documented
    * [[graft.ops.Relational.aggApproxDistinct]] trade). */
  def analyzeStats(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount")
    val li = table(spark, dir, "lineitem")
    val aggs = cols.flatMap { c =>
      Seq(count_distinct(col(c)).as(s"${c}_ndv"),
        sum(col(c).isNull.cast(LongType)).as(s"${c}_nulls"),
        min(col(c)).cast(DoubleType).as(s"${c}_min"),
        max(col(c)).cast(DoubleType).as(s"${c}_max"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col(s"${c}_ndv").as("ndv"),
        col(s"${c}_nulls").as("nulls"),
        col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"))): _*))
        .as("s"))
      .select("s.column", "s.ndv", "s.nulls", "s.min_v", "s.max_v")
      .orderBy("column")
  }

  /** Distribution DRIFT detection — the day-over-day feature-drift check
    * an ML training pipeline runs before trusting new data: histogram
    * each day's value distribution into 10 fixed equal-width bins (edges
    * from the global max, so every day bins identically) and score each
    * consecutive-day pair with the chi-square distance
    * Σ (pᵢ−qᵢ)²/(pᵢ+qᵢ) over Laplace-smoothed bin shares. Chi-square
    * rather than the PSI's log ON PURPOSE: it is transcendental-free, so
    * both engines evaluate the identical rational arithmetic on identical
    * bits (ln differs in the last ulp across libm implementations).
    * Shape: one keyed (day, bin) count, pivoted to a fixed 10-wide row
    * per day, consecutive days paired by an equi join on day+1 — the
    * drift scan costs one aggregate over the data plus day-count rows of
    * join, nothing quadratic. */
  def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
    val maxv = ev.agg(max("value")).head().getDouble(0)
    val bin = least(floor(col("value") * 10.0 / maxv), lit(9.0))
      .cast(IntegerType)
    val binAggs = (0 to 9).map(k =>
      sum(when(col("bin") === k, 1L).otherwise(0L)).as(s"b$k")) :+
      count(lit(1)).as("n")
    // both sides of the day-pair join derive from this one aggregate —
    // materialize so the events scan runs once (the multi-consumer rule)
    val wide = ev.withColumn("bin", bin)
      .groupBy("day")
      .agg(binAggs.head, binAggs.tail: _*)
      .materialized
    def share(pfx: String, k: Int): org.apache.spark.sql.Column =
      (col(s"$pfx.b$k") + lit(1L)).cast(DoubleType) /
        (col(s"$pfx.n") + lit(10L)).cast(DoubleType)
    val chi2 = (0 to 9).map { k =>
      val (p, q) = (share("a", k), share("b", k))
      (p - q) * (p - q) / (p + q)
    }.reduce(_ + _)
    wide.as("a")
      .withColumn("next_day",
        date_format(date_add(to_date(col("day")), 1), "yyyy-MM-dd"))
      .join(wide.as("b"), col("next_day") === col("b.day"))
      .select(col("a.day").as("day1"), col("b.day").as("day2"),
        roundD(chi2, 6).as("chi2"),
        (chi2 > 0.2).cast(IntegerType).as("drift"))
      .orderBy("day1")
  }

  /** JOIN-CARDINALITY pre-flight — [[dqSkew]]'s companion: the EXACT output
    * row count of a prospective equi-join, computed from the two sides'
    * per-key count frames (Σ_k c₁(k)·c₂(k)) without running the join.
    * `blowup_permille` (output rows vs the larger input, integer-exact)
    * is the number that separates a benign FK join (≤1000‰) from a
    * many-to-many explosion that will OOM a shuffle at 100 TB — the
    * check a pipeline runs on a NEW join key before scheduling it. The
    * count frames are keyed aggregates with map-side partials; their FULL
    * outer join carries one row per key on either side, so the audit's
    * cost is the key cardinality, never the would-be join output — and the
    * input sizes the blow-up denominator needs ride the SAME aggregate
    * (Σ c over each side's full count frame = that table's row count), so
    * the op launches zero extra jobs beyond the estimate itself. */
  def dqCardinality(spark: SparkSession, dir: String): DataFrame = {
    def est(name: String, l: DataFrame, lk: String,
        r: DataFrame, rk: String): DataFrame = {
      val lc = l.groupBy(col(lk).as("k")).agg(count(lit(1)).as("c1"))
      val rc = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("c2"))
      // full join: inner terms give the output estimate, each side's sum
      // gives its total rows (keys missing on the other side included)
      lc.join(rc, Seq("k"), "full")
        .agg(
          sum(coalesce(col("c1"), lit(0L)) * coalesce(col("c2"), lit(0L)))
            .as("out_rows"),
          sum(coalesce(col("c1"), lit(0L))).as("n1"),
          sum(coalesce(col("c2"), lit(0L))).as("n2"))
        .select(lit(name).as("join_key"),
          coalesce(col("out_rows"), lit(0L)).as("out_rows"),
          greatest(col("n1"), col("n2")).as("bigger_side"))
    }
    // SELF-join estimate: lc == rc by construction, and a full join of a
    // frame with itself on its key matches every NON-NULL-keyed row — so
    // Σ c1·c2 = Σ c² over non-null keys and n1 = n2 = Σ c over ALL rows.
    // One keyed count + one reduction instead of two identical groupBys
    // and a self full-join (guide §2.4: the join's only job was
    // re-pairing a frame with itself). The NULL-key group is excluded
    // from out_rows (an equi-join never matches NULL = NULL, exactly as
    // the unmatched-side coalesce-to-0 did in the join form) but kept in
    // n, which counts the frame's total rows.
    def estSelf(name: String, d: DataFrame, k: String): DataFrame =
      d.groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
        .agg(sum(when(col("k").isNotNull, col("c") * col("c"))).as("out_rows"),
          sum("c").as("n"))
        .select(lit(name).as("join_key"),
          coalesce(col("out_rows"), lit(0L)).as("out_rows"),
          col("n").as("bigger_side"))
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val ev = table(spark, dir, "events")
    val cust = table(spark, dir, "customer")
    est("lineitem*orders.orderkey", li, "l_orderkey", ord, "o_orderkey")
      .unionByName(est("orders*customer.custkey", ord, "o_custkey",
        cust, "c_custkey"))
      .unionByName(estSelf("events*events.user_id", ev, "user_id"))
      .select(col("join_key"), col("out_rows"),
        expr("out_rows * 1000 div bigger_side").as("blowup_permille"))
      .orderBy("join_key")
  }

  /** REFERENTIAL-INTEGRITY audit — the pre-flight a warehouse runs before
    * trusting joins: for each declared FK edge, count child rows whose key
    * has no parent (plus one deliberately-degraded edge — parts above
    * size 25 filtered out of the dim, simulating a stale/partial
    * dimension load — so the detector provably fires). Each edge is one
    * LEFT ANTI join aggregated to a single row: the anti join shuffles on
    * the key (or broadcasts when the parent is a dim), cost O(child +
    * parent), and the n_orphans/n_child outputs make the all-green state
    * hash-verified rather than assumed. */
  def dqReferential(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      // one pass: left join the (distinct) parent keys, count rows and
      // misses in the same aggregate — no second scan, no 1x1 cross join
      child.select(col(ck).as("k"))
        .join(parent.select(col(pk).as("k")).distinct()
          .withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
          (col("n_orphans") === 0L).as("ok"))
    val li = table(spark, dir, "lineitem")
    edge("lineitem->part", li, "l_partkey",
        table(spark, dir, "part"), "p_partkey")
      .unionByName(edge("lineitem->supplier", li, "l_suppkey",
        table(spark, dir, "supplier"), "s_suppkey"))
      .unionByName(edge("lineitem->orders", li, "l_orderkey",
        table(spark, dir, "orders"), "o_orderkey"))
      .unionByName(edge("orders->customer", table(spark, dir, "orders"),
        "o_custkey", table(spark, dir, "customer"), "c_custkey"))
      .unionByName(edge("lineitem->part[stale:size<=25]", li, "l_partkey",
        table(spark, dir, "part").filter(col("p_size") <= 25), "p_partkey"))
      .orderBy("fk")
  }

  /** KEY-UNIQUENESS audit — [[dqReferential]]'s sibling: for each declared
    * key, how many distinct values, how many values carry duplicates, and
    * how many surplus rows those duplicates add. One keyed count plus a
    * one-row conditional rollup per table — cost ∝ scan, never a self
    * join. `events.user_id` is the deliberately non-unique control (a
    * user has many events), so the detector provably reports, while the
    * real primary keys must come back clean to hash-match. */
  def dqUnique(spark: SparkSession, dir: String): DataFrame = {
    def audit(name: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1L, 1L).otherwise(0L)).as("n_dup_keys"),
          sum(when(col("c") > 1L, col("c") - 1L).otherwise(0L))
            .as("n_extra_rows"))
        .select(lit(name).as("key_name"), col("n_keys"), col("n_dup_keys"),
          col("n_extra_rows"), (col("n_dup_keys") === 0L).as("unique"))
    audit("events.event_id", table(spark, dir, "events"), "event_id")
      .unionByName(audit("events.user_id",
        table(spark, dir, "events"), "user_id"))
      .unionByName(audit("orders.o_orderkey",
        table(spark, dir, "orders"), "o_orderkey"))
      .unionByName(audit("part.p_partkey",
        table(spark, dir, "part"), "p_partkey"))
      .orderBy("key_name")
  }

  /** FRESHNESS AUDIT — the staleness pre-flight next to [[dqUnique]]'s
    * key audit: per monitored (table, timestamp column), the newest
    * event-time and its age in whole days against the lake-wide maximum
    * (the pipeline's "now" — a wall-clock literal would make the result
    * non-reproducible), flagged against a 7-day SLA. Each probe is ONE
    * max() aggregate — partial-agg'd map-side and answerable from
    * parquet footer stats, so the audit costs metadata, not scans; the
    * "now" fold is a 3-row frame. The stale dimension a dashboard
    * silently joins against is the classic slow-burn incident; this is
    * the query that pages before it ships. */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    def probe(name: String, df: DataFrame, ts: String): DataFrame =
      df.agg(max(unix_micros(col(ts).cast(TimestampType))).as("mx_us"),
        tsStr(max(col(ts))).as("max_ts")).select(lit(name).as("tbl"),
        col("max_ts"), col("mx_us"))
    val m = probe("events.ts", table(spark, dir, "events"), "ts")
      .unionByName(probe("lineitem.l_shipdate",
        table(spark, dir, "lineitem"), "l_shipdate"))
      .unionByName(probe("orders.o_orderdate",
        table(spark, dir, "orders"), "o_orderdate"))
    m.crossJoin(broadcast(m.agg(max("mx_us").as("now_us"))))
      .select(col("tbl"), col("max_ts"),
        expr("(now_us - mx_us) div 86400000000").as("age_days"),
        (expr("(now_us - mx_us) div 86400000000") > 7L).as("stale"))
      .orderBy("tbl")
  }

  /** INGEST-VOLUME ANOMALY — the pipeline-health twin of [[dqFreshness]]:
    * daily row counts, each judged against its own trailing-7-day window
    * (flag when the day lands under HALF the trailing mean — the "feed
    * silently died mid-day" signal). The detector runs entirely on the
    * |days|-row count frame: one keyed aggregate over events (map-side
    * combined), then a window over bounded metadata — at 100 TB the
    * window input is still ~365 rows/year, never the event stream. The
    * test cross-multiplies (2·cnt·n_trail < Σ_trail) so no float
    * approaches the verdict. */
  def dqVolume(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = table(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    days
      .withColumn("trail_sum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("n_trail", count("cnt").over(w))
      .select(col("day"), col("cnt"), col("trail_sum"), col("n_trail"),
        (col("n_trail") > 0L &&
          col("cnt") * col("n_trail") * 2L < col("trail_sum")).as("dropped"))
      .orderBy("day")
  }

  /** The hour-grain twin of [[dqVolume]] with an explicit zero-filled
    * grid — the SAME aggregation
    * ([[graft.streaming.StreamAssembly.rateAgg]]) that backs the
    * streaming rate monitor, registered so the oracle pins the verdict
    * both runtimes share (StreamingSpec proves the stream emits these
    * exact rows). The grid explode is O(hours per type), the trailing
    * window runs over that bounded frame, and silent hours materialize
    * as cnt=0 rows — the row a plain GROUP BY can never produce, and the
    * one the drop detector exists for. */
  def dqRateHourly(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamAssembly.rateAgg(table(spark, dir, "events"))
      .orderBy("event_type", "hour_ms")

  /** FUNCTIONAL-DEPENDENCY PROFILE — does column A determine column B?
    * The schema-discovery primitive behind key inference, normalization
    * advice, and "is this column safe to drop from the grouping key":
    * for each declared candidate A→B, one keyed exact count-distinct of
    * B per A value, summarized as (distinct A values, values with >1
    * distinct B, the worst fan-out, holds?). `o_orderkey→o_custkey` and
    * `n_nationkey→n_regionkey` must hold (key / hierarchy), the
    * behavioral candidates must fail with their measured violation mass.
    *
    * Scale shape: each candidate is a two-level hash aggregate over one
    * scan of its table — shuffle ∝ |distinct A|, map-side partial on
    * (A, B) pairs first, and the summary is one row per candidate. No
    * sampling: FD claims are exactly the statements a sample can't
    * certify. */
  def dqFd(spark: SparkSession, dir: String): DataFrame = {
    val cands = Seq(
      ("orders", "o_orderkey", "o_custkey"),
      ("orders", "o_custkey", "o_orderpriority"),
      ("lineitem", "l_orderkey", "l_suppkey"),
      ("nation", "n_nationkey", "n_regionkey"),
      ("customer", "c_nationkey", "c_mktsegment"))
    cands.map { case (t, det, dep) =>
      table(spark, dir, t)
        .groupBy(col(det).as("k"))
        .agg(countDistinct(col(dep)).as("nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nd").as("max_rhs"))
        .select(lit(s"$t.$det->$dep").as("fd"), col("n_keys"),
          col("n_violating"), col("max_rhs"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionByName _).orderBy("fd")
  }

  /** COLUMN-ASSOCIATION PROFILE — the statistical companion to
    * [[dqFd]]'s hard determinism verdict: χ² independence of event type
    * against weekday, with Cramér's V as the normalized effect size
    * ("is traffic mix a weekday artifact, and how strongly"). The answer
    * gates whether a model may train on one and impute the other.
    *
    * Exactness: observed counts and both margins are exact integers; each
    * cell's χ² contribution is one scalar double tree (identical both
    * engines) QUANTIZED to the 1e−6 grid before summation, so the
    * cross-cell sum is an exact BIGINT in any partition order (the
    * dq_drift convention — never a float sum). The contingency frame is
    * |types|×7 cells: margins broadcast, the one-row total rides a
    * documented 1×|cells| broadcast nested loop. */
  def dqAssoc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val o = materialize(table(spark, dir, "events")
      .groupBy(col("event_type").as("rk"),
        (dayofweek(col("ts")) - 1).as("ck"))
      .agg(count(lit(1)).as("o")))
    val rm = o.groupBy("rk").agg(sum("o").as("rn"))
    val cm = o.groupBy("ck").agg(sum("o").as("cn"))
    val nf = o.agg(sum("o").as("n"),
      countDistinct("rk").as("nr"), countDistinct("ck").as("nc"))
    def d(c: String) = col(c).cast(DoubleType)
    val num = d("o") * d("n") - d("rn") * d("cn")
    val cells = o.join(broadcast(rm), "rk").join(broadcast(cm), "ck")
      .crossJoin(broadcast(nf))
      .select(col("n"), col("nr"), col("nc"),
        floor(num * num / (d("n") * d("rn") * d("cn")) * 1e6 + 0.5)
          .cast(LongType).as("q"))
    cells.groupBy("n", "nr", "nc")
      .agg(count(lit(1)).as("n_cells"), sum("q").as("qsum"))
      .select(col("n").as("n_rows"), col("n_cells"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        (col("qsum").cast(DoubleType) / 1e6).as("chi2"),
        roundD(sqrt(col("qsum").cast(DoubleType) / 1e6 /
          (d("n") * least(col("nr") - 1, col("nc") - 1)
            .cast(DoubleType))), 6).as("cramers_v"))
  }

  /** HOURLY EVENT-MIX ENTROPY — the Shannon companion to [[dqDrift]]'s
    * pairwise χ² and `driftStream`'s JSD-vs-profile: per hour, the
    * entropy (bits) of the event-type distribution over the streaming
    * monitor's fixed symbol set + other-bucket. Entropy catches the
    * DEGENERACY pathology divergence misses (a feed collapsing to one
    * event type craters H even when that type dominates the baseline
    * too) — the alarm pair a training-data ingest wants on its mix.
    *
    * One definition, two runtimes: this is the BATCH run of
    * [[graft.streaming.StreamAssembly.entropyAgg]], the identical
    * aggregation `entropyStream` executes per watermark-closed hour
    * (StreamingSpec pins bit-exact parity) — so the oracle that verifies
    * this query verifies the streaming monitor's arithmetic with it.
    * Exactness: the `text_jsd` quantized-log2 closed form; scale shape:
    * one map-side-combined conditional-count aggregate, rows = hours. */
  def dqEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamAssembly.entropyAgg(table(spark, dir, "events"))
      .orderBy("hour_ms")

  /** SEQUENCE-GAP AUDIT — per UTC day, holes in the event-id sequence:
    * in-day missing count ((max−min+1) − rows) and the gap across the
    * previous day's boundary. An ingest that drops a batch leaves a
    * hole in an otherwise dense id sequence long before volumes drift
    * enough for [[dqVolume]] to alarm — this is the cheap exactness
    * check that catches it at the id grain. One map-side-combined daily
    * aggregate; the lag window runs over the |days|-row result, not the
    * event stream. All integers. */
  def dqGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = table(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"),
        count(lit(1)).as("n_rows"))
    d.withColumn("prev_hi", lag(col("hi"), 1).over(Window.orderBy("day")))
      .select(col("day"), col("lo"), col("hi"), col("n_rows"),
        (col("hi") - col("lo") + 1 - col("n_rows")).as("n_missing"),
        when(col("prev_hi").isNull, lit(0L))
          .otherwise(col("lo") - col("prev_hi") - 1).as("boundary_gap"))
      .orderBy("day")
  }

  /** HEARTBEAT AUDIT — the longest silent stretch per (type, day): the
    * max interarrival gap in ms over the (ts, id)-ordered per-type
    * stream. [[dqFreshness]] catches a feed that DIED (staleness now);
    * this catches a feed that HICCUPPED — a half-hour hole inside an
    * otherwise-on-time day is invisible to freshness and volume checks
    * but is exactly the outage a liquidation feed cares about (the
    * reference's idle watchdog, at audit grain). One lag window per
    * (type, day) slice, integer ms; single-event days report 0. */
  def dqHeartbeat(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = date_format(col("ts"), "yyyy-MM-dd")
    val w = Window.partitionBy("event_type", "day")
      .orderBy("ts_ms", "event_id")
    table(spark, dir, "events")
      .select(col("event_type"), day.as("day"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        coalesce(max("gap"), lit(0L)).as("max_gap_ms"))
      .orderBy("event_type", "day")
  }

  /** The (digit → Benford probability) profile for [[dqBenford]]:
    * P(d) = log10(1 + 1/d), d ∈ 1..9 — generated ONCE here and inlined
    * as the identical double literals into both engines' expressions
    * (the `driftBaseline` convention for shared constants). */
  private[graft] val benfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** The monetary columns [[dqBenford]] audits: multiplicative,
    * several-orders-of-magnitude spreads — the regime where Benford's
    * law is the null hypothesis and deviation flags fabrication or a
    * generator/unit bug (the classic forensic-accounting screen, here
    * as an ingest audit beside [[dqVolume]]'s count anomalies). */
  private val benfordCols = Seq(
    "lineitem" -> "l_extendedprice", "orders" -> "o_totalprice")

  /** BENFORD FIRST-DIGIT AUDIT — per audited monetary column, the
    * observed leading-significant-digit distribution against Benford's
    * P(d) = log10(1+1/d), with the per-column χ² statistic: one row per
    * (column, digit) carrying observed count, observed and expected
    * permille, and the column's χ² (repeated across its 9 rows — it IS
    * the per-column verdict). A synthetic generator that draws prices
    * uniformly (as this corpus does) FAILS the screen loudly — large
    * χ² — which is exactly what the audit is for; conforming ledgers
    * score near zero.
    *
    * Exactness: the leading digit is extracted from the INTEGER cents
    * string (never log10 of a double — a price exactly 10^k would sit
    * on the ulp fence), absent digits still owe their χ² term via the
    * column×1..9 frame, each (obs−exp)²/exp term is one identical
    * double tree quantized to the 1e−6 grid, and the cross-digit sum
    * is BIGINT (the [[dqAssoc]]/[[dqDrift]] convention — never a float
    * sum). Scale shape: one map-side-combined 9-bucket count per
    * column plus window math over |cols|×9 = 18 rows; nothing about
    * this changes at 100 TB. */
  /** The per-column digit extraction, split out so the sub-cent edge is
    * spec-pinnable closed-form: cents >= 1, not value > 0 — a positive
    * value below 0.005 rounds to zero cents, whose leading "digit" is 0,
    * outside the 1..9 Benford frame. The oracle's explicit digit frame
    * drops such rows from both the output AND the χ² denominator n;
    * filtering here keeps the two engines on the identical row set
    * (the formerly-latent r12 edge, now locked by AnalyticsOpsSpec). */
  private[graft] def benfordDigits(rows: DataFrame, c: String): DataFrame = {
    val cents = (col(c).cast(DecimalType(18, 2)) * 100).cast(LongType)
    // Leading digit by a FIXED long-division reduction instead of
    // cast-to-string + substring: the string path allocates a UTF8String
    // per row and was the measured hot loop of the whole query (the two
    // digit-extraction scan tasks owned ~1.2 s of the bench exec at
    // sf0.1); five conditional integer divides stay in whole-stage
    // codegen with zero allocation. Exact by construction: cents <
    // 10^18, each step strips a fixed count of trailing digits only when
    // at least one leading digit remains (d ≥ 10^k ⇒ d div 10^k ≥ 1), so
    // the chain ends at the leading digit — bounds d1<10^9, d2<10^5,
    // d3<10^3, d4<10^2, d5<10. cents = 0 yields 0 (dropped below, as the
    // string path's '0' was); a NULL propagates to NULL (dropped below,
    // as substring(NULL) was). AnalyticsOpsSpec proves equality against
    // the substring form over the full magnitude sweep.
    // the 1..9 frame filter runs on CENTS, below the chain: digit ≥ 1 ⇔
    // cents ≥ 1 (cents 0 → digit 0; NULL propagates; negatives are out
    // via value > 0), and a filter on the chain OUTPUT would be
    // pushdown-substituted through all five Projects — 3^5 copies of the
    // cents subtree in one predicate, measured 10x SLOWER than the
    // string form it replaced
    val start = rows.where(col(c) > 0)
      .select(cents.as("d")).where(col("d") >= 1L)
    val reduced = Seq(1000000000L, 100000L, 1000L, 100L, 10L)
      .foldLeft(start)((df, p) =>
        // `div` (IntegralDivide) — `/` on longs is double division, which
        // loses ulps past 2^53; each step is its own Project (CASE refs d
        // three times, so CollapseProject keeps them stacked — five
        // sequential steps per row inside one codegen stage, no
        // exponential expression blowup)
        df.select(expr(s"CASE WHEN d >= $p THEN d div $p ELSE d END").as("d")))
    reduced.select(col("d").cast(IntegerType).as("digit"))
  }

  def dqBenford(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def one(tbl: String, c: String): DataFrame =
      benfordDigits(table(spark, dir, tbl), c)
        .groupBy("digit").agg(count(lit(1)).as("cnt"))
        .select(lit(s"$tbl.$c").as("col_name"), col("digit"), col("cnt"))
    val counts = benfordCols.map((one _).tupled).reduce(_ unionByName _)
    // every column owes all 9 digit terms, observed or not: the audited
    // column list is static, so the zero frame is a LITERAL 18-row union
    // folded in by the same aggregate — one scan per table, no join back
    // against the (twice-recomputed) counts branch
    val zeros = counts.sparkSession.range(1)
      .select(explode(typedLit(
        benfordCols.map { case (t, c) => s"$t.$c" })).as("col_name"))
      .select(col("col_name"),
        explode(typedLit((1 to 9).toArray)).as("digit"),
        lit(0L).as("cnt"))
    val full = counts.unionByName(zeros)
      .groupBy("col_name", "digit").agg(sum("cnt").as("cnt"))
    val w = Window.partitionBy("col_name")
    val pd = benfordP.tail.foldLeft(
      when(col("digit") === benfordP.head._1, lit(benfordP.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    val expPm = benfordP.tail.foldLeft(
      when(col("digit") === benfordP.head._1,
        lit(math.round(benfordP.head._2 * 1000).toInt))) {
      case (acc, (d, p)) => acc.when(col("digit") === d,
        lit(math.round(p * 1000).toInt))
    }
    val n = sum("cnt").over(w)
    val ex = n.cast(DoubleType) * pd
    val cd = col("cnt").cast(DoubleType)
    full
      .withColumn("n", n)
      .withColumn("q",
        floor((cd - ex) * (cd - ex) / ex * 1e6 + 0.5).cast(LongType))
      .select(col("col_name"), col("digit"), col("cnt"),
        expr("cnt * 1000 div n").as("obs_pm"),
        expPm.as("exp_pm"),
        (sum("q").over(w).cast(DoubleType) / 1e6).as("chi2"))
      .orderBy("col_name", "digit")
  }

  /** Engine-portable row signature for [[dqChecksum]]/[[dqRecon]]: md5
    * over a '|'-joined canonical serialization — every field rendered
    * through an integer (epoch micros, money cents, decimal-string ids)
    * so no float/timestamp formatting divergence can enter the hash;
    * NULLs print as the literal 'null' (concat_ws would silently SKIP
    * them, making "a|null" and "a" collide). */
  private def rowSig(df: DataFrame): DataFrame = {
    val cents = (col("value").cast(DecimalType(18, 2)) * lit(100))
      .cast(LongType)
    df.select(col("event_id"), to_date(col("ts")).as("day"),
      md5(concat_ws("|",
        col("event_id").cast(StringType),
        unix_micros(col("ts")).cast(StringType),
        col("user_id").cast(StringType),
        col("event_type"),
        coalesce(cents.cast(StringType), lit("null")),
        coalesce(col("props"), lit("null")))).as("sig"))
  }

  /** PARTITION CHECKSUM — the cheap dataset-equality primitive (the
    * audit the reference's dual-sink mode implicitly owes: `--sink both`
    * writes every row to CSV AND Postgres, `stream.py:169-188` /
    * `writer_pg.py:174-196`, with nothing ever proving the two copies
    * stayed equal): one
    * ORDER-INDEPENDENT checksum per day (sum of a 32-bit slice of each
    * row's [[rowSig]] md5) plus the row count. Two copies of a table
    * (a migration, a replica, a rewritten partition) compare by this
    * day-grain frame — bytes proportional to |days|, not |rows| — and
    * only a mismatching day needs the row-level [[dqRecon]] drill-down.
    * Map-side only: the hash is computed in the scan projection and the
    * sum partially aggregates; the shuffle carries one row per (day,
    * task). Commutative sum means file/partition order never matters. */
  def dqChecksum(spark: SparkSession, dir: String): DataFrame =
    rowSig(table(spark, dir, "events"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        conv(substring(col("sig"), 1, 8), 16, 10).cast(LongType).as("h"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
      .orderBy("day")

  /** SNAPSHOT RECONCILIATION — when [[dqChecksum]] says two copies
    * diverge, this names HOW: a full-outer key join of the two snapshots
    * comparing [[rowSig]] signatures, classifying every key as same /
    * changed / only_a / only_b, rolled up to (day, status) counts. The
    * B side is a deterministic synthetic drift of A (drops every 97th
    * key, bumps every 31st value, clones every 101st under a new id) so
    * both engines rebuild the identical pair of snapshots.
    *
    * Scale shape: signatures reduce each row to (key, day, 32 bytes)
    * BEFORE the join, so the shuffle carries fingerprints, not payloads;
    * the join is keyed on the primary key both snapshots would already
    * be bucketed by in a real lakehouse (the [[graft.ops.Bucketing]]
    * co-location argument), and the output is |days|·4 rows. */
  def dqRecon(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val bSrc = ev.filter(col("event_id") % 97 =!= 0)
      .withColumn("value",
        when(col("event_id") % 31 === 0, col("value") + lit(1.0))
          .otherwise(col("value")))
      .unionByName(ev.filter(col("event_id") % 101 === 0)
        .withColumn("event_id", col("event_id") + lit(1000000000000L)))
    val a = rowSig(ev).toDF("event_id", "da", "sa")
    val b = rowSig(bSrc).toDF("event_id", "db", "sb")
    a.join(b, Seq("event_id"), "full_outer")
      .select(
        date_format(coalesce(col("da"), col("db")), "yyyy-MM-dd").as("day"),
        when(col("sa").isNull, "only_b")
          .when(col("sb").isNull, "only_a")
          .when(col("sa") =!= col("sb"), "changed")
          .otherwise("same").as("status"))
      .groupBy("day", "status").agg(count(lit(1)).as("n"))
      .orderBy("day", "status")
  }

  /** SCHEMA/PROFILE DRIFT between the corpus's two temporal halves — the
    * ingest-regression tripwire the point-in-time audits (`dq_audit`,
    * `analyze_stats`) cannot raise: a feed change shows up as a per-COLUMN
    * profile shift between "before" and "after" (null rate creeping up =
    * an adapter dropping a field; distinct-count collapsing = an upstream
    * defaulting a value; liq-stream's coalescing extractors
    * `binance_adapter.py:93-94` are exactly where such drift silently
    * enters). Split at the MEASURED midpoint day — cut = lo + ⌈span/2⌉
    * over the corpus's [min, max] day range, so any corpus spanning ≥2
    * days yields two non-empty halves and a profile (a fixed lo+15 cut
    * silently muted the audit on shorter corpora; a single-day corpus has
    * no "before/after" and still profiles empty, by definition) — then
    * profile the four payload-bearing columns per half (n, nulls,
    * distinct), report integer-permille null rates and the distinct-drift
    * permille |d₁−d₂|·1000/max.
    *
    * Scale shape: one stack-unpivot projection (map-side, 4 rows per
    * event) into ONE (col, half)-keyed aggregate; the count(DISTINCT) is
    * Spark's two-phase distinct aggregate — partial dedup before the
    * 8-key shuffle, the standard ANALYZE cost paid at profile time. */
  def dqSchemaDrift(spark: SparkSession, dir: String): DataFrame =
    schemaDriftOf(table(spark, dir, "events"))

  private[graft] def schemaDriftOf(events: DataFrame): DataFrame = {
    val d = expr("unix_micros(ts) div 86400000000")
    val b = events.agg(min(d).as("lo"), max(d).as("hi")).head()
    // midpoint cut: lo + ceil(span/2); equals the old lo+15 on the
    // standard 30-day corpus (hash-stable), non-degenerate on short ones
    val cut = b.getLong(0) + (b.getLong(1) - b.getLong(0) + 1L) / 2L
    val stacked = events
      .select(when(d < lit(cut), 1).otherwise(2).as("half"),
        expr("""stack(4,
            'event_type', CAST(event_type AS STRING),
            'user_id',    CAST(user_id AS STRING),
            'value',      CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS STRING),
            'props',      props
          ) AS (col, sval)"""))
    val prof = stacked.groupBy("col", "half")
      .agg(count(lit(1)).as("n"), sum(when(col("sval").isNull, 1L)
        .otherwise(0L)).as("nulls"), countDistinct(col("sval")).as("nd"))
    val h1 = prof.filter(col("half") === 1)
      .select(col("col"), col("n").as("n1"), col("nulls").as("null1"),
        col("nd").as("nd1"))
    val h2 = prof.filter(col("half") === 2)
      .select(col("col"), col("n").as("n2"), col("nulls").as("null2"),
        col("nd").as("nd2"))
    h1.join(h2, "col")
      .select(col("col"), col("n1"), col("n2"),
        expr("null1 * 1000 div n1").as("null_pm1"),
        expr("null2 * 1000 div n2").as("null_pm2"),
        col("nd1"), col("nd2"),
        expr("abs(nd1 - nd2) * 1000 div greatest(nd1, nd2)")
          .as("dist_drift_pm"))
      .orderBy("col")
  }

  /** NEAR-TIME DUPLICATE (BOUNCE) AUDIT — consecutive events of the SAME
    * (type, user) within one second: the double-fire signature of a
    * client retry / at-least-once replay that exact-row dedup
    * (`dedup_keys`) cannot see because the duplicate carries a fresh id
    * and a jittered timestamp. The reference's at-most-once posture
    * (liq-stream `writer_pg.py` has no upsert; replays become visible
    * rows) makes this THE audit its consumers run. One (type, user)-keyed
    * lag window — state is a single previous row, shuffle ∝ events on the
    * same key set the dedup already uses — then a map-side-combined
    * per-type aggregate; permille share in exact integers. */
  def dqBounce(spark: SparkSession, dir: String): DataFrame =
    bounceOf(table(spark, dir, "events"))

  private[graft] def bounceOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy("ts", "event_id")
    events
      .select(col("event_type"),
        (unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("gap_us") <= 1000000L, 1L).otherwise(0L)).as("bounced"))
      .select(col("event_type"), col("n"), col("bounced"),
        expr("bounced * 1000 div n").as("bounce_pm"))
      .orderBy("event_type")
  }

  /** RULE CONFORMANCE AUDIT — the declarative contract check a feed owner
    * publishes next to the schema: five rules (known event-type alphabet,
    * non-negative value, JSON-object-shaped props, positive user id,
    * plausible timestamp range), each reported as n / violations /
    * integer-permille rate. NULL fails a rule (a missing value cannot
    * conform) — the fail-closed posture [[dqRef]]/[[dqUnique]] share.
    * Scale shape: ONE stack-unpivot projection (map-side, 5 rows per
    * event, the [[schemaDriftOf]] pattern) into one 5-key aggregate —
    * a single scan however many rules the contract grows. */
  def dqConformance(spark: SparkSession, dir: String): DataFrame =
    conformanceOf(table(spark, dir, "events"))

  private[graft] def conformanceOf(events: DataFrame): DataFrame =
    events
      .select(expr("""stack(5,
          'event_type_known',
          CASE WHEN event_type IN ('click','error','purchase','signup','view')
               THEN 0 ELSE 1 END,
          'props_json_object',
          CASE WHEN props IS NOT NULL AND props LIKE '{%' AND props LIKE '%}'
               THEN 0 ELSE 1 END,
          'ts_in_range',
          CASE WHEN ts >= TIMESTAMP '2020-01-01 00:00:00'
                AND ts <  TIMESTAMP '2030-01-01 00:00:00' THEN 0 ELSE 1 END,
          'user_id_positive',
          CASE WHEN user_id > 0 THEN 0 ELSE 1 END,
          'value_nonneg',
          CASE WHEN value >= 0 THEN 0 ELSE 1 END
        ) AS (rule, viol)"""))
      .groupBy("rule")
      .agg(count(lit(1)).as("n"), sum(col("viol").cast("long"))
        .as("violations"))
      .select(col("rule"), col("n"), col("violations"),
        expr("violations * 1000 div n").as("viol_pm"))
      .orderBy("rule")

  /** ORDERING AUDIT — how often event ids arrive OUT OF ORDER relative to
    * event time, per type: an id below the running maximum of everything
    * earlier means the producer's sequence and the event clock disagree
    * (a replayed segment, a backfill interleaved with live, clock skew
    * across producer shards — the reference's multi-connection fan-in,
    * `stream.py:24-36`, makes this the expected failure shape).
    * Complements [[dqGaps]] (missing ids) and [[dqBounce]] (duplicate
    * fires) with the third sequencing pathology: PRESENT but misplaced.
    * One keyed running-max window (single-long state) + a map-side
    * per-type aggregate; all integers. */
  def dqMonotonic(spark: SparkSession, dir: String): DataFrame =
    monotonicOf(table(spark, dir, "events"))

  private[graft] def monotonicOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_type"), col("event_id"),
        max(col("event_id")).over(w).as("runmax"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") < col("runmax"), 1L).otherwise(0L))
          .as("inversions"))
      .select(col("event_type"), col("n"), col("inversions"),
        expr("inversions * 1000 div n").as("inv_pm"))
      .orderBy("event_type")
  }

  /** The DuckDB twin of [[rowSig]]'s serialization (md5 over the same
    * '|'-joined integer-canonical fields) — interpolated into both
    * checksum/recon oracles so the two engines hash identical bytes. */
  private val sigSql =
    """md5(concat_ws('|', CAST(event_id AS VARCHAR),
         CAST(epoch_us(ts) AS VARCHAR), CAST(user_id AS VARCHAR), event_type,
         COALESCE(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS VARCHAR), 'null'),
         COALESCE(props, 'null')))"""

  val oracles: Map[String, String] = Map(
    // same five CASE rules (NULL fails), same integer permille
    "dq_conformance" -> """
      WITH r AS (
        SELECT rule, viol FROM (
          SELECT 'event_type_known' AS rule,
                 CASE WHEN event_type IN
                        ('click','error','purchase','signup','view')
                      THEN 0 ELSE 1 END AS viol FROM events
          UNION ALL
          SELECT 'props_json_object',
                 CASE WHEN props IS NOT NULL AND props LIKE '{%'
                       AND props LIKE '%}' THEN 0 ELSE 1 END FROM events
          UNION ALL
          SELECT 'ts_in_range',
                 CASE WHEN ts >= TIMESTAMP '2020-01-01 00:00:00'
                       AND ts <  TIMESTAMP '2030-01-01 00:00:00'
                      THEN 0 ELSE 1 END FROM events
          UNION ALL
          SELECT 'user_id_positive',
                 CASE WHEN user_id > 0 THEN 0 ELSE 1 END FROM events
          UNION ALL
          SELECT 'value_nonneg',
                 CASE WHEN value >= 0 THEN 0 ELSE 1 END FROM events))
      SELECT rule, count(*) AS n,
             CAST(sum(viol) AS BIGINT) AS violations,
             CAST(sum(viol) AS BIGINT) * 1000 // count(*) AS viol_pm
      FROM r GROUP BY 1 ORDER BY rule""",
    // same running max over the strictly-earlier frame, same integer test
    "dq_monotonic" -> """
      WITH r AS (
        SELECT event_type, event_id,
               max(event_id) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        FROM events)
      SELECT event_type, count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN event_id < runmax THEN 1 ELSE 0 END)
                  AS BIGINT) AS inversions,
             CAST(sum(CASE WHEN event_id < runmax THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000 // count(*) AS inv_pm
      FROM r GROUP BY 1 ORDER BY event_type""",
    // same (type,user)-keyed lag, same 1s threshold on exact µs gaps
    "dq_bounce" -> """
      WITH g AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
                 PARTITION BY event_type, user_id
                 ORDER BY ts, event_id)) AS gap_us
        FROM events)
      SELECT event_type, count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN gap_us <= 1000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bounced,
             CAST(sum(CASE WHEN gap_us <= 1000000 THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000 // count(*) AS bounce_pm
      FROM g GROUP BY 1 ORDER BY event_type""",
    // same midpoint split, same stacked per-column profile (value
    // canonicalized to integer cents in BOTH engines before the distinct)
    "dq_schema_drift" -> """
      WITH b AS (SELECT min(epoch_us(ts) // 86400000000)
                        + (max(epoch_us(ts) // 86400000000)
                           - min(epoch_us(ts) // 86400000000) + 1) // 2
                          AS cut
                 FROM events),
      stacked AS (
        SELECT CASE WHEN epoch_us(ts) // 86400000000 < (SELECT cut FROM b)
                    THEN 1 ELSE 2 END AS half,
               'event_type' AS col, CAST(event_type AS VARCHAR) AS sval
        FROM events
        UNION ALL
        SELECT CASE WHEN epoch_us(ts) // 86400000000 < (SELECT cut FROM b)
                    THEN 1 ELSE 2 END, 'user_id', CAST(user_id AS VARCHAR)
        FROM events
        UNION ALL
        SELECT CASE WHEN epoch_us(ts) // 86400000000 < (SELECT cut FROM b)
                    THEN 1 ELSE 2 END, 'value',
               CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS VARCHAR)
        FROM events
        UNION ALL
        SELECT CASE WHEN epoch_us(ts) // 86400000000 < (SELECT cut FROM b)
                    THEN 1 ELSE 2 END, 'props', props
        FROM events),
      prof AS (SELECT col, half, count(*)::BIGINT AS n,
                      CAST(sum(CASE WHEN sval IS NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS nulls,
                      count(DISTINCT sval)::BIGINT AS nd
               FROM stacked GROUP BY 1, 2)
      SELECT h1.col, h1.n AS n1, h2.n AS n2,
             h1.nulls * 1000 // h1.n AS null_pm1,
             h2.nulls * 1000 // h2.n AS null_pm2,
             h1.nd AS nd1, h2.nd AS nd2,
             abs(h1.nd - h2.nd) * 1000 // greatest(h1.nd, h2.nd)
               AS dist_drift_pm
      FROM prof h1 JOIN prof h2 ON h1.col = h2.col
      WHERE h1.half = 1 AND h2.half = 2
      ORDER BY h1.col""",
    // identical integer margins, per-cell double tree, 1e-6 quantized sum
    "dq_assoc" ->
      """WITH o AS (SELECT event_type AS rk, dayofweek(ts) AS ck,
                           count(*) AS o
                    FROM events GROUP BY 1, 2),
         rm AS (SELECT rk, CAST(sum(o) AS BIGINT) AS rn FROM o GROUP BY 1),
         cm AS (SELECT ck, CAST(sum(o) AS BIGINT) AS cn FROM o GROUP BY 1),
         nf AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                       count(DISTINCT rk) AS nr,
                       count(DISTINCT ck) AS nc
                FROM o),
         cells AS (
           SELECT n, nr, nc,
                  CAST(floor((o.o::DOUBLE * n::DOUBLE
                              - rn::DOUBLE * cn::DOUBLE)
                             * (o.o::DOUBLE * n::DOUBLE
                                - rn::DOUBLE * cn::DOUBLE)
                             / (n::DOUBLE * rn::DOUBLE * cn::DOUBLE)
                             * 1e6 + 0.5) AS BIGINT) AS q
           FROM o JOIN rm USING (rk) JOIN cm USING (ck), nf)
         SELECT n AS n_rows, count(*) AS n_cells,
                (nr - 1) * (nc - 1) AS dof,
                CAST(sum(q) AS BIGINT)::DOUBLE / 1e6 AS chi2,
                floor(sqrt(CAST(sum(q) AS BIGINT)::DOUBLE / 1e6
                           / (n::DOUBLE
                              * least(nr - 1, nc - 1)::DOUBLE))
                      * 1e6 + 0.5) / 1e6 AS cramers_v
         FROM cells GROUP BY n, nr, nc""",
    "dq_fd" -> {
      def cand(t: String, det: String, dep: String) =
        s"""SELECT '$t.$det->$dep' AS fd, count(*) AS n_keys,
              CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              max(nd) AS max_rhs,
              sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
            FROM (SELECT $det, count(DISTINCT $dep) AS nd
                  FROM $t GROUP BY 1)"""
      Seq(("orders", "o_orderkey", "o_custkey"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_orderkey", "l_suppkey"),
        ("nation", "n_nationkey", "n_regionkey"),
        ("customer", "c_nationkey", "c_mktsegment"))
        .map { case (t, d, p) => cand(t, d, p) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },
    "dq_checksum" -> s"""
      WITH s AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                        ('0x' || substr($sigSql, 1, 8))::BIGINT AS h
                 FROM events)
      SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS n_rows,
             CAST(sum(h) AS BIGINT) AS checksum
      FROM s GROUP BY 1 ORDER BY day""",
    "dq_recon" -> s"""
      WITH ev AS (SELECT event_id, ts, user_id, event_type, value, props
                  FROM events),
      bsrc AS (
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 31 = 0 THEN value + 1.0
                    ELSE value END AS value, props
        FROM ev WHERE event_id % 97 <> 0
        UNION ALL
        SELECT event_id + 1000000000000, ts, user_id, event_type, value,
               props
        FROM ev WHERE event_id % 101 = 0),
      sa AS (SELECT event_id, CAST(date_trunc('day', ts) AS DATE) AS da,
                    $sigSql AS sva
             FROM ev),
      sb AS (SELECT event_id, CAST(date_trunc('day', ts) AS DATE) AS db,
                    $sigSql AS svb
             FROM bsrc),
      j AS (SELECT strftime(COALESCE(sa.da, sb.db), '%Y-%m-%d') AS day,
                   CASE WHEN sva IS NULL THEN 'only_b'
                        WHEN svb IS NULL THEN 'only_a'
                        WHEN sva <> svb THEN 'changed'
                        ELSE 'same' END AS status
            FROM sa FULL OUTER JOIN sb ON sa.event_id = sb.event_id)
      SELECT day, status, count(*) AS n
      FROM j GROUP BY 1, 2 ORDER BY day, status""",
    "dq_rate_hourly" -> """
      WITH c AS (
        SELECT event_type, epoch_ms(ts) // 3600000 * 3600000 AS hour_ms,
               count(*) AS cnt
        FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, min(hour_ms) AS lo, max(hour_ms) AS hi
            FROM c GROUP BY 1),
      g AS (SELECT event_type,
                   unnest(range(lo, hi + 3600000, 3600000)) AS hour_ms
            FROM b),
      f AS (SELECT g.event_type, g.hour_ms, COALESCE(c.cnt, 0) AS cnt
            FROM g LEFT JOIN c USING (event_type, hour_ms)),
      t AS (SELECT event_type, hour_ms, cnt,
                   COALESCE(sum(cnt) OVER (PARTITION BY event_type
                     ORDER BY hour_ms
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
                   count(cnt) OVER (PARTITION BY event_type
                     ORDER BY hour_ms
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_trail
            FROM f)
      SELECT event_type, hour_ms, cnt,
             CAST(trail_sum AS BIGINT) AS trail_sum, n_trail,
             n_trail > 0 AND cnt * n_trail * 2 < trail_sum AS dropped
      FROM t ORDER BY event_type, hour_ms""",
    "dq_volume" -> """
      WITH d AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS cnt
        FROM events GROUP BY 1),
      t AS (
        SELECT day, cnt,
               COALESCE(sum(cnt) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
               count(cnt) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_trail
        FROM d)
      SELECT day, cnt, CAST(trail_sum AS BIGINT) AS trail_sum, n_trail,
             n_trail > 0 AND cnt * n_trail * 2 < trail_sum AS dropped
      FROM t ORDER BY day""",
    "dq_freshness" -> """
      WITH m AS (
        SELECT 'events.ts' AS tbl,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
               max(epoch_us(ts)) AS mx_us
        FROM events
        UNION ALL
        SELECT 'lineitem.l_shipdate',
               strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S.%f'),
               max(epoch_us(l_shipdate))
        FROM lineitem
        UNION ALL
        SELECT 'orders.o_orderdate',
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S.%f'),
               max(epoch_us(o_orderdate))
        FROM orders),
      g AS (SELECT max(mx_us) AS now_us FROM m)
      SELECT tbl, max_ts, (now_us - mx_us) // 86400000000 AS age_days,
             (now_us - mx_us) // 86400000000 > 7 AS stale
      FROM m, g ORDER BY tbl""",
    "dq_unique" -> """
      WITH a AS (
        SELECT 'events.event_id' AS key_name, count(*) AS n_keys,
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup_keys,
               sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS n_extra_rows
        FROM (SELECT event_id, count(*) AS c FROM events GROUP BY 1)
        UNION ALL
        SELECT 'events.user_id', count(*),
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END),
               sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
        FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
        UNION ALL
        SELECT 'orders.o_orderkey', count(*),
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END),
               sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
        FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'part.p_partkey', count(*),
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END),
               sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
        FROM (SELECT p_partkey, count(*) AS c FROM part GROUP BY 1))
      SELECT key_name, n_keys, n_dup_keys::BIGINT AS n_dup_keys,
             n_extra_rows::BIGINT AS n_extra_rows,
             n_dup_keys = 0 AS unique
      FROM a ORDER BY key_name""",
    "dq_ref" -> """
      WITH e AS (
        SELECT 'lineitem->part' AS fk,
               (SELECT count(*) FROM lineitem) AS n_child,
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM part p
                  WHERE p.p_partkey = l.l_partkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem->supplier',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'lineitem->orders',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o WHERE NOT EXISTS
                 (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem->part[stale:size<=25]',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM part p
                  WHERE p.p_size <= 25 AND p.p_partkey = l.l_partkey)))
      SELECT fk, n_child, n_orphans, n_orphans = 0 AS ok
      FROM e ORDER BY fk""",
    "analyze_stats" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", count(DISTINCT $c) AS ndv,
                   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS nulls,
                   CAST(min($c) AS DOUBLE) AS min_v,
                   CAST(max($c) AS DOUBLE) AS max_v
            FROM lineitem"""
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount")
        .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          ")\nORDER BY \"column\"")
    },
    // identical fixed-bin histogram + the same left-associated chi-square
    // term order; Laplace smoothing keeps every term finite
    "dq_drift" -> {
      def share(pfx: String, k: Int) =
        s"(CAST($pfx.b$k + 1 AS DOUBLE) / CAST($pfx.n + 10 AS DOUBLE))"
      val chi2 = (0 to 9).map { k =>
        val (p, q) = (share("a", k), share("b", k))
        s"($p - $q) * ($p - $q) / ($p + $q)"
      }.mkString(" + ")
      val bins = (0 to 9).map(k =>
        s"CAST(SUM(CASE WHEN bin = $k THEN 1 ELSE 0 END) AS BIGINT) AS b$k")
        .mkString(", ")
      s"""WITH mx AS (SELECT max(value) AS m FROM events
                      WHERE value IS NOT NULL),
          e AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                       CAST(least(floor(value * 10.0 / mx.m), 9.0) AS INT)
                         AS bin
                FROM events, mx WHERE value IS NOT NULL),
          w AS (SELECT day, $bins, count(*) AS n FROM e GROUP BY day)
          SELECT a.day AS day1, b.day AS day2,
                 floor(($chi2) * 1e6 + 0.5) / 1e6 AS chi2,
                 CAST(($chi2) > 0.2 AS INTEGER) AS drift
          FROM w a JOIN w b
            ON strftime(CAST(a.day AS DATE) + 1, '%Y-%m-%d') = b.day
          ORDER BY day1"""
    },
    // the streaming entropy monitor's aggregation replayed over integer
    // conditional counts: same fixed symbol order, same quantized-log2
    // closed form, same final double tree (6 dp)
    "dq_entropy" -> {
      val symbols = graft.streaming.StreamAssembly.driftBaseline.map(_._1)
      def ql(x: String) =
        s"CAST(floor(log2(($x)::DOUBLE) * 1e6 + 0.5) AS BIGINT)"
      val condCounts = symbols.zipWithIndex.map { case (t, i) =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
      }.mkString(", ")
      val other = s"(n - ${symbols.indices.map(i => s"c$i").mkString(" - ")})"
      val terms = (symbols.indices.map(i => s"c$i") :+ other)
        .map(c => s"CASE WHEN $c > 0 THEN $c * ${ql(c)} ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH h AS (
        SELECT epoch_ms(ts) // 3600000 * 3600000 AS hour_ms,
               $condCounts,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1)
      SELECT hour_ms, n,
             floor(((n::DOUBLE * ${ql("n")}::DOUBLE - ($terms)::DOUBLE)
                      / (n::DOUBLE * 1e6)) * 1e6 + 0.5) / 1e6
               AS entropy_bits
      FROM h ORDER BY hour_ms"""
    },
    // same per-(type, day) lag over (ts, id); max of integer ms gaps
    "dq_heartbeat" -> """
      WITH g AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                 PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                 ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
             CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_ms
      FROM g GROUP BY 1, 2 ORDER BY event_type, day""",
    // same daily id-span arithmetic; lag over the daily frame
    "dq_gaps" -> """
      WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(min(event_id) AS BIGINT) AS lo,
               CAST(max(event_id) AS BIGINT) AS hi,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1)
      SELECT day, lo, hi, n_rows,
             hi - lo + 1 - n_rows AS n_missing,
             CASE WHEN lag(hi) OVER (ORDER BY day) IS NULL THEN 0
                  ELSE lo - lag(hi) OVER (ORDER BY day) - 1
             END AS boundary_gap
      FROM d ORDER BY day""",
    // the Benford audit replayed: same integer-cents digit extraction,
    // same double literals for P(d) (interpolated from benfordP, so both
    // engines parse the identical shortest-round-trip representation),
    // same quantize-then-BIGINT-sum chi-square
    "dq_benford" -> {
      val srcs = Seq(
        ("lineitem.l_extendedprice", "lineitem", "l_extendedprice"),
        ("orders.o_totalprice", "orders", "o_totalprice")).map {
        case (name, t, c) =>
          s"""SELECT '$name' AS col_name,
                 CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM $t WHERE $c > 0"""
      }.mkString("\nUNION ALL\n")
      val pdCase = benfordP.map { case (d, p) =>
        s"WHEN $d THEN CAST($p AS DOUBLE)" }.mkString("CASE digit ", " ", " END")
      val pmCase = benfordP.map { case (d, p) =>
        s"WHEN $d THEN ${math.round(p * 1000)}" }
        .mkString("CASE digit ", " ", " END")
      s"""
      WITH src AS ($srcs),
      c AS (SELECT col_name,
                   CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                     AS digit,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM src GROUP BY 1, 2),
      f AS (SELECT d.col_name, dig.digit,
                   CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
            FROM (SELECT DISTINCT col_name FROM c) d
            CROSS JOIN (SELECT CAST(range AS INTEGER) AS digit
                        FROM range(1, 10)) dig
            LEFT JOIN c ON c.col_name = d.col_name AND c.digit = dig.digit),
      p AS (SELECT col_name, digit, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY col_name) AS BIGINT) AS n,
                   $pdCase AS pd,
                   CAST($pmCase AS INTEGER) AS exp_pm
            FROM f),
      q AS (SELECT *,
                   CAST(floor((CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) * pd)
                        * (CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) * pd)
                        / (CAST(n AS DOUBLE) * pd) * 1e6 + 0.5) AS BIGINT)
                     AS qv
            FROM p)
      SELECT col_name, digit, cnt, cnt * 1000 // n AS obs_pm, exp_pm,
             CAST(sum(qv) OVER (PARTITION BY col_name) AS DOUBLE) / 1e6
               AS chi2
      FROM q ORDER BY col_name, digit"""
    },
    "dq_cardinality" -> {
      def one(name: String, lt: String, lk: String, rt: String, rk: String) =
        s"""SELECT '$name' AS join_key,
                   CAST(coalesce(SUM(c1 * c2), 0) AS BIGINT) AS out_rows,
                   CAST(coalesce(SUM(c1 * c2), 0) * 1000 AS BIGINT)
                     // greatest((SELECT count(*) FROM $lt),
                               (SELECT count(*) FROM $rt)) AS blowup_permille
            FROM (SELECT $lk AS k, count(*) AS c1 FROM $lt GROUP BY 1) a
            JOIN (SELECT $rk AS k, count(*) AS c2 FROM $rt GROUP BY 1) b
            USING (k)"""
      s"""SELECT * FROM (
            ${one("lineitem*orders.orderkey",
              "lineitem", "l_orderkey", "orders", "o_orderkey")}
            UNION ALL
            ${one("orders*customer.custkey",
              "orders", "o_custkey", "customer", "c_custkey")}
            UNION ALL
            ${one("events*events.user_id",
              "events", "user_id", "events", "user_id")})
          ORDER BY join_key"""
    },
    "dq_skew" -> {
      def one(tbl: String, key: String) =
        s"""SELECT '$tbl.$key' AS key_col,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   count(*) AS n_keys,
                   CAST(max(c) * 1000 AS BIGINT) // CAST(sum(c) AS BIGINT)
                     AS top1_permille,
                   CAST((SELECT sum(c) FROM
                          (SELECT c FROM (SELECT $key AS k, count(*) AS c
                                          FROM $tbl GROUP BY 1)
                           ORDER BY c DESC, k LIMIT 10)) * 1000 AS BIGINT)
                     // CAST(sum(c) AS BIGINT) AS top10_permille,
                   CAST(max(c) * count(*) > 10 * CAST(sum(c) AS BIGINT)
                        AS INTEGER) AS skewed
            FROM (SELECT $key AS k, count(*) AS c FROM $tbl GROUP BY 1)"""
      s"""SELECT * FROM (
            ${one("lineitem", "l_orderkey")}
            UNION ALL
            ${one("orders", "o_custkey")}
            UNION ALL
            ${one("events", "user_id")}
            UNION ALL
            ${one("events", "event_type")})
          ORDER BY key_col"""
    },
    "dq_audit" ->
      """SELECT * FROM (
           SELECT 'lineitem_orphan_orderkey' AS check, count(*) AS violations
           FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
           UNION ALL
           SELECT 'events_null_value', count(*) FROM events WHERE value IS NULL
           UNION ALL
           SELECT 'lineitem_nonpositive_qty', count(*)
           FROM lineitem WHERE l_quantity <= 0.0
           UNION ALL
           SELECT 'events_ts_out_of_range', count(*) FROM events
           WHERE ts < TIMESTAMP '2020-01-01 00:00:00'
              OR ts >= TIMESTAMP '2030-01-01 00:00:00'
           UNION ALL
           SELECT 'orders_dup_pk', count(*) - count(DISTINCT o_orderkey)
           FROM orders)
         ORDER BY "check"""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_ref" -> dqReferential _,
    "dq_schema_drift" -> dqSchemaDrift _,
    "dq_bounce" -> dqBounce _,
    "dq_monotonic" -> dqMonotonic _,
    "dq_conformance" -> dqConformance _,
    "dq_unique" -> dqUnique _,
    "dq_freshness" -> dqFreshness _,
    "dq_volume" -> dqVolume _,
    "dq_rate_hourly" -> dqRateHourly _,
    "dq_audit" -> dqAudit _,
    "dq_skew" -> dqSkew _,
    "dq_cardinality" -> dqCardinality _,
    "analyze_stats" -> analyzeStats _,
    "dq_drift" -> dqDrift _,
    "dq_checksum" -> dqChecksum _,
    "dq_recon" -> dqRecon _,
    "dq_fd" -> dqFd _,
    "dq_assoc" -> dqAssoc _,
    "dq_entropy" -> dqEntropy _,
    "dq_benford" -> dqBenford _,
    "dq_gaps" -> dqGaps _,
    "dq_heartbeat" -> dqHeartbeat _,
  )
}
