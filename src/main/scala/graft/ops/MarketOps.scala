package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Market-microstructure / technical-analysis indicators over the event
  * stream — the dashboard layer every consumer of the reference's feed
  * builds next (liq-stream itself stops at raw rows, `writer_pg.py:23-36`;
  * its README's "last 6h" views are exactly these series): VWAP, Bollinger
  * bands, RSI, MACD, max drawdown, and per-day realized volatility, all on
  * the per-type daily series the [[TimeWindows]] candles already establish.
  *
  * Scale shape shared by the family: the expensive input (raw events) is
  * reduced FIRST by one keyed aggregate to the (type, day) grain —
  * map-side partials, one shuffle on the grouping key — and every
  * indicator window/fold after that runs on |types|·|days| rows,
  * independent of tick volume (the [[TimeWindows.tsFill]] argument). The
  * two tick-grain members (ta_vwap, ta_rv) are themselves single keyed
  * aggregates with exact (decimal / integer) accumulators, so partials
  * combine map-side and partition order cannot move the result.
  *
  * Cross-engine exactness (the house conventions, SURVEY §5): daily closes
  * quantize to integer CENTS (floor(x·100+0.5) — both engines bit-exact on
  * identical doubles), window sums over ints are order-free, EMA taps are
  * fixed expression trees of dyadic-rational weights (never a windowed
  * double sum, whose addition order an engine may choose), and each final
  * ratio is ONE double expression evaluated on bit-identical inputs in
  * both engines, then [[roundD]]-quantized. */
object MarketOps {

  /** Per-type DAILY CLOSE — last fill of each (type, UTC day), ties broken
    * by the day-grain packed ordering key ([[TimeWindows.tsEwma]]'s ordDay:
    * µs-in-day · 2²⁰ + id mod 2²⁰ — one BIGINT keeps max_by
    * HashAggregate-eligible; a (ts, id) struct would force SortAggregate).
    * `d` (epoch-day index) rides along as the integer ordering key for the
    * indicator windows; `day` is the output grain label. */
  private[graft] def dailyCloseOf(events: DataFrame): DataFrame = {
    val ord = (unix_micros(col("ts")) % 86400000000L) * 1048576L +
      pmod(col("event_id"), lit(1048576L))
    events.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(max_by(col("value"), ord).as("close"))
  }

  /** The DuckDB twin of [[dailyCloseOf]] — shared text so the five daily
    * consumers can never drift from each other. */
  private val dailyCloseSql: String =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS d,
              strftime(ts, '%Y-%m-%d') AS day,
              arg_max(value, (epoch_us(ts) % 86400000000) * 1048576
                             + (event_id % 1048576)) AS close
       FROM events GROUP BY 1, 2, 3"""

  // ---------------------------------------------------------------- VWAP

  /** Daily VOLUME-WEIGHTED average price per type: Σ(price·size)/Σ(size),
    * size = the `props.k` payload field ([[JsonOps.jsonExtract]]'s column —
    * the reference carries order quantity exactly so, inside the raw JSON;
    * liq-stream `binance_adapter.py:93-94`). Complements [[TimeWindows.twap]]
    * (time-weighted) with the fill-weighted price every execution report
    * quotes. ONE keyed aggregate at tick grain: the DECIMAL(18,2)·INT
    * notional and the BIGINT size sum are both exact and combine map-side;
    * the single double division happens once per output row. */
  def taVwap(spark: SparkSession, dir: String): DataFrame =
    vwapOf(table(spark, dir, "events"))

  /** The VWAP aggregate columns and finishing projection, shared verbatim
    * by the batch query and the streaming twin
    * ([[graft.streaming.StreamAssembly.vwapStream]]) — the
    * sessionAggOf/candleAggs one-definition-two-runtimes convention. */
  private[graft] def vwapAggExprs: Seq[Column] = {
    val k = get_json_object(col("props"), "$.k").cast(IntegerType)
    Seq(count(lit(1)).as("n"),
      sum(k.cast(LongType)).as("qty"),
      sum(col("value").cast(DecimalType(18, 2)) * k).as("notional"))
  }

  private[graft] def vwapFinish(df: DataFrame): DataFrame =
    df.select(col("event_type"), col("day"), col("n"), col("qty"),
      roundD(col("notional").cast(DoubleType) /
        nullif(col("qty"), lit(0L)).cast(DoubleType), 6).as("vwap"))

  private[graft] def vwapOf(events: DataFrame): DataFrame =
    vwapFinish(events
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(vwapAggExprs.head, vwapAggExprs.tail: _*))
      .orderBy("event_type", "day")

  // ----------------------------------------------------------- Bollinger

  /** BOLLINGER BANDS — 5-day rolling mean ± 2σ (sample) on the daily
    * close, plus the breach flag (close outside its own band) that feeds
    * mean-reversion alerts. Sums run over integer cents (order-free); the
    * variance numerator n·Σx²−(Σx)² and the band arithmetic are one double
    * tree on those exact ints — identical bits in both engines. greatest(…,0)
    * guards the tiny negative FP residue a constant window leaves, so σ=0,
    * never NaN. Warm-up rows (n<2, no sample σ) drop in both engines. */
  def taBollinger(spark: SparkSession, dir: String): DataFrame =
    bollingerOf(table(spark, dir, "events"))

  private[graft] def bollingerOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-4, 0)
    val base = dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))
      .select(col("event_type"), col("day"), col("close"),
        count(lit(1)).over(w).as("n"),
        sum(col("c")).over(w).cast(DoubleType).as("sx"),
        sum(col("c") * col("c")).over(w).cast(DoubleType).as("sxx"))
      .filter(col("n") >= 2)
    val nd = col("n").cast(DoubleType)
    val ma = col("sx") / nd / 100.0
    val sd = sqrt(greatest((col("sxx") * nd - col("sx") * col("sx")) /
      (nd * (nd - 1.0)), lit(0.0))) / 100.0
    base.select(col("event_type"), col("day"), col("close"), col("n"),
        roundD(ma, 6).as("ma"), roundD(sd, 6).as("sd"),
        roundD(ma + lit(2.0) * sd, 6).as("upper"),
        roundD(ma - lit(2.0) * sd, 6).as("lower"),
        (col("close") > ma + lit(2.0) * sd || col("close") < ma - lit(2.0) * sd)
          .cast(IntegerType).as("breach"))
      .orderBy("event_type", "day")
  }

  // ----------------------------------------------------------------- RSI

  /** RSI-7 (Cutler's simple-moving-average form — the window-aggregate
    * variant; Wilder's recursive smoothing is [[taMacd]]'s EMA shape) on
    * daily closes: 100·Σgain/(Σgain+Σloss) over the trailing 7 close-to-
    * close moves. Gains/losses are exact cent deltas, the 7-row sums are
    * integer (order-free), and rows without a full 7-move window drop in
    * both engines (position-based warm-up — the trading-days convention).
    * A flat week (Σgain+Σloss=0) yields NULL, never 0/0. */
  def taRsi(spark: SparkSession, dir: String): DataFrame =
    rsiOf(table(spark, dir, "events"))

  private[graft] def rsiOf(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
    val w7 = wo.rowsBetween(-6, 0)
    dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))
      .withColumn("delta", col("c") - lag(col("c"), 1).over(wo))
      .filter(col("delta").isNotNull)
      .select(col("event_type"), col("day"), col("d"),
        sum(greatest(col("delta"), lit(0L))).over(w7).as("gain7"),
        sum(greatest(-col("delta"), lit(0L))).over(w7).as("loss7"),
        count(lit(1)).over(w7).as("m"))
      .filter(col("m") === 7)
      .select(col("event_type"), col("day"), col("gain7"), col("loss7"),
        roundD(lit(100.0) * col("gain7").cast(DoubleType) /
          nullif(col("gain7") + col("loss7"), lit(0L)).cast(DoubleType), 6)
          .as("rsi"))
      .orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------- MACD

  /** MACD on daily closes — fast EMA (decay 3/4, 8 taps) minus slow EMA
    * (decay 15/16, 16 taps), with a 4-tap signal line (decay 1/2) over the
    * quantized MACD and the histogram. Bounded-tap EMAs, the
    * [[TimeWindows.tsEwma]] convention: the exact recursion needs
    * unbounded running state; k taps truncate it to a FIXED expression
    * tree of `lag`s (head rows normalize by the weights present), which
    * parallelizes and — critically for the oracle — fixes the double
    * ADDITION ORDER, where a windowed double sum would leave it to the
    * engine. Every weight d^j is a dyadic rational: exactly representable,
    * and its shortest-round-trip literal parses back to the identical
    * double in DuckDB. The signal line reads the roundD-quantized MACD so
    * the chained window starts from bit-pinned inputs. */
  def taMacd(spark: SparkSession, dir: String): DataFrame =
    macdOf(table(spark, dir, "events"))

  private[graft] val macdFastD = 0.75
  private[graft] val macdSlowD = 0.9375
  private[graft] val macdSigD = 0.5
  private[graft] val macdFastK = 8
  private[graft] val macdSlowK = 16
  private[graft] val macdSigK = 4

  private def emaTaps(src: Column, w: org.apache.spark.sql.expressions.WindowSpec,
      k: Int, d: Double): Column = {
    val num = (0 until k).map(j => coalesce(lag(src, j).over(w), lit(0.0)) *
      lit(math.pow(d, j))).reduce(_ + _)
    val den = (0 until k).map(j => when(lag(src, j).over(w).isNotNull,
      lit(math.pow(d, j))).otherwise(lit(0.0))).reduce(_ + _)
    num / den
  }

  private[graft] def macdOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("d")
    val withMacd = dailyCloseOf(events)
      .select(col("event_type"), col("day"), col("d"), col("close"),
        roundD(emaTaps(col("close"), w, macdFastK, macdFastD), 6).as("ema_fast"),
        roundD(emaTaps(col("close"), w, macdSlowK, macdSlowD), 6).as("ema_slow"))
      .withColumn("macd", roundD(col("ema_fast") - col("ema_slow"), 6))
    withMacd
      .withColumn("signal", roundD(emaTaps(col("macd"), w, macdSigK, macdSigD), 6))
      .select(col("event_type"), col("day"), col("ema_fast"), col("ema_slow"),
        col("macd"), col("signal"),
        roundD(col("macd") - col("signal"), 6).as("hist"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------------------ Drawdown

  /** MAX DRAWDOWN per type — the risk readout under every performance
    * chart: the largest peak-to-trough fall of the daily close, as a share
    * of the running peak, plus the day it troughed (earliest day among
    * ties — an explicit min, never an engine's arg_max tie whim). The
    * running peak is a cumulative integer max (order-free prefix), the
    * per-row ratio one double division on exact cents. */
  def taDrawdown(spark: SparkSession, dir: String): DataFrame =
    drawdownOf(table(spark, dir, "events"))

  private[graft] def drawdownOf(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("event_type")
    dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))
      .withColumn("peak", max(col("c")).over(wo))
      .withColumn("dd", roundD((col("peak") - col("c")).cast(DoubleType) /
        nullif(col("peak"), lit(0L)).cast(DoubleType), 6))
      .withColumn("max_dd", max(col("dd")).over(wf))
      .withColumn("n_days", count(lit(1)).over(wf))
      .filter(col("dd") === col("max_dd"))
      // min over the INTEGER day index, not the day string: a string
      // min/max buffer is not fixed-width, which demotes the whole
      // aggregate to SortAggregate (PlanAudit catches it); the label is
      // derived after the aggregate, one row per type
      .groupBy("event_type")
      .agg(max(col("n_days")).as("n_days"), max(col("dd")).as("max_dd"),
        min(col("d")).as("td"))
      .select(col("event_type"), col("n_days"), col("max_dd"),
        date_format(timestamp_micros(col("td") * 86400000000L), "yyyy-MM-dd")
          .as("trough_day"))
      .orderBy("event_type")
  }

  /** CALMAR RATIO per type — annualized return over max drawdown, the
    * recovery-adjusted performance headline next to [[taSharpe]]'s
    * volatility-adjusted one. Annualization is LINEAR
    * ((c_last/c_first − 1)·252/n) by design: a CAGR power would drag
    * `pow` into the compare, whose libm results the two engines don't
    * pin — every term here is either exact integer (first/last cent
    * closes by the integer day index, day count) or the same
    * single-division IEEE tree as [[drawdownOf]]'s per-day dd. NULL on
    * a drawdown-free series (nullif), never infinity. One window pass
    * + one |types|-row aggregate, the drawdown scale shape. */
  def taCalmar(spark: SparkSession, dir: String): DataFrame =
    calmarOf(table(spark, dir, "events"))

  private[graft] def calmarOf(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))
      .withColumn("peak", max(col("c")).over(wo))
      .withColumn("dd", roundD((col("peak") - col("c")).cast(DoubleType) /
        nullif(col("peak"), lit(0L)).cast(DoubleType), 6))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        min_by(col("c"), col("d")).as("cf"),
        max_by(col("c"), col("d")).as("cl"),
        max(col("dd")).as("max_dd"))
    val ann = (col("cl").cast(DoubleType) / col("cf").cast(DoubleType) -
      lit(1.0)) * lit(252.0) / col("n_days").cast(DoubleType)
    base.select(col("event_type"), col("n_days"),
        roundD(ann, 6).as("ann_ret"), col("max_dd"),
        roundD(ann / nullif(col("max_dd"), lit(0.0)), 6).as("calmar"))
      .orderBy("event_type")
  }

  // ------------------------------------------------- Realized volatility

  /** PER-DAY REALIZED VOLATILITY from tick-level simple returns —
    * √Σrᵢ² over each (type, day)'s consecutive-fill returns
    * rᵢ = vᵢ/vᵢ₋₁ − 1 (the model-free intraday risk estimator; simple
    * returns deliberately, not log returns — division is correctly
    * rounded IEEE, identical in both engines, where libm log() is not —
    * the [[TimeWindows]] week7Cos trust boundary). Each return quantizes
    * to integer MICRO-units (floor(r·1e6+0.5)); the sum of squares rides
    * an exact wide-decimal accumulator (a 0.01→490 move is r≈49 000 →
    * r²≈2.4e21, past int64 — HUGEINT on the DuckDB side), so partials
    * combine map-side in any order; √ and the 1e-6 rescale are one
    * identical double tail. Single-fill days have no return: NULL vol. */
  def taRv(spark: SparkSession, dir: String): DataFrame =
    rvOf(table(spark, dir, "events"))

  private[graft] def rvOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd")).orderBy("ts", "event_id")
    val r = col("value") / nullif(lag(col("value"), 1).over(w), lit(0.0)) - 1.0
    events
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        floor(r * 1e6 + 0.5).cast(LongType).as("ri"))
      .groupBy("event_type", "day")
      .agg(count(col("ri")).as("n_ret"),
        sum(col("ri").cast(DecimalType(18, 0)) *
          col("ri").cast(DecimalType(18, 0))).as("ssq"))
      .select(col("event_type"), col("day"), col("n_ret"),
        roundD(sqrt(col("ssq").cast(DoubleType)) / 1e6, 6).as("rv"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------------- ATR / %K

  /** Per-type daily OHLC in integer cents — [[dailyCloseOf]] widened with
    * the day's high/low (plain min/max — order-free) for the range-based
    * indicators. Same one-keyed-aggregate scale shape. */
  private[graft] def dailyOhlcOf(events: DataFrame): DataFrame = {
    val ord = (unix_micros(col("ts")) % 86400000000L) * 1048576L +
      pmod(col("event_id"), lit(1048576L))
    events.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(floor(max(col("value")) * 100 + 0.5).cast(LongType).as("hi"),
        floor(min(col("value")) * 100 + 0.5).cast(LongType).as("lo"),
        floor(max_by(col("value"), ord) * 100 + 0.5).cast(LongType).as("cl"))
  }

  /** The [[dailyOhlcOf]] DuckDB twin, shared by the two range indicators. */
  private val dailyOhlcSql: String =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS d,
              strftime(ts, '%Y-%m-%d') AS day,
              CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS hi,
              CAST(floor(min(value) * 100 + 0.5) AS BIGINT) AS lo,
              CAST(floor(arg_max(value,
                     (epoch_us(ts) % 86400000000) * 1048576
                     + (event_id % 1048576)) * 100 + 0.5) AS BIGINT) AS cl
       FROM events GROUP BY 1, 2, 3"""

  /** AVERAGE TRUE RANGE (7-day simple mean — Wilder's smoothing is the
    * [[taMacd]] EMA shape; the SMA form keeps the window sum integer) on
    * daily candles: TR = max(hi−lo, |hi−prev_cl|, |lo−prev_cl|) — the
    * gap-aware volatility unit position sizing divides by. All-integer
    * cents until one final /100 rescale; first-day rows (no prev close)
    * use hi−lo in both engines. */
  def taAtr(spark: SparkSession, dir: String): DataFrame =
    atrOf(table(spark, dir, "events"))

  private[graft] def atrOf(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
    val w7 = wo.rowsBetween(-6, 0)
    dailyOhlcOf(events)
      // first day: prev close defaults to the day's own close, which
      // collapses TR to hi−lo (lo ≤ cl ≤ hi) with no NULL-greatest
      // semantics in play — the two engines disagree on greatest(NULL)
      .withColumn("pc", coalesce(lag(col("cl"), 1).over(wo), col("cl")))
      .withColumn("tr", greatest(col("hi") - col("lo"),
        abs(col("hi") - col("pc")), abs(col("lo") - col("pc"))))
      .select(col("event_type"), col("day"), col("tr"),
        sum(col("tr")).over(w7).as("s"), count(lit(1)).over(w7).as("m"))
      .select(col("event_type"), col("day"),
        (col("tr").cast(DoubleType) / 100.0).as("tr"),
        roundD(col("s").cast(DoubleType) /
          col("m").cast(DoubleType) / 100.0, 6).as("atr"))
      .orderBy("event_type", "day")
  }

  /** STOCHASTIC %K (7-day) — where today's close sits inside the trailing
    * week's range: 100·(close − low₇)/(high₇ − low₇), the bounded
    * mean-reversion oscillator beside [[taRsi]]'s momentum one. Window
    * extrema are integer min/max (order-free); one double ratio; a
    * zero-range week (high₇ = low₇) yields NULL in both engines. */
  def taStoch(spark: SparkSession, dir: String): DataFrame =
    stochOf(table(spark, dir, "events"))

  private[graft] def stochOf(events: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    dailyOhlcOf(events)
      .select(col("event_type"), col("day"), col("cl"),
        min(col("lo")).over(w7).as("l7"), max(col("hi")).over(w7).as("h7"))
      .select(col("event_type"), col("day"),
        (col("cl").cast(DoubleType) / 100.0).as("close"),
        roundD(lit(100.0) * (col("cl") - col("l7")).cast(DoubleType) /
          nullif(col("h7") - col("l7"), lit(0L)).cast(DoubleType), 6)
          .as("pct_k"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------------------ MA cross

  /** MOVING-AVERAGE CROSSING DETECTOR — the golden/death-cross SIGNAL
    * events (not a series: the output is only the days where the 3-day
    * close mean crosses the 7-day one, with direction). Detection on
    * integers: a cross at day t is sign(f_t·s7 − s_t·s3 scaled) flipping
    * vs day t−1 — the means compare CROSS-MULTIPLIED (f·7·nₛ vs s·3·n_f
    * generalized to warm-up widths), so no division ever happens and the
    * flip test is exact BIGINT. Emitted rows only; a series that never
    * crosses emits nothing. */
  def taSmaCross(spark: SparkSession, dir: String): DataFrame =
    smaCrossOf(table(spark, dir, "events"))

  private[graft] def smaCrossOf(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
    val w3 = wo.rowsBetween(-2, 0)
    val w7 = wo.rowsBetween(-6, 0)
    val base = dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))
      .select(col("event_type"), col("d"), col("day"),
        sum(col("c")).over(w3).as("sf"), count(lit(1)).over(w3).as("nf"),
        sum(col("c")).over(w7).as("ss"), count(lit(1)).over(w7).as("ns"))
      // diff = sign(fast - slow) without division: sf/nf vs ss/ns
      // cross-multiplied (all longs; cents*7*|days| stays far inside 2^63)
      .withColumn("rel",
        when(col("sf") * col("ns") > col("ss") * col("nf"), 1L)
          .when(col("sf") * col("ns") < col("ss") * col("nf"), -1L)
          .otherwise(0L))
      // the POSITION is the last nonzero relation: a cross is a true
      // sign FLIP, never the warm-up's equal-windows 0 → ±1 transition
      // (days 0-2 have w3 = w7, rel = 0 by construction) nor a
      // touch-and-continue through 0
      .withColumn("ppos", last(nullif(col("rel"), lit(0L)),
        ignoreNulls = true)
        .over(wo.rowsBetween(Window.unboundedPreceding, -1)))
    base
      .filter(col("rel") =!= 0L && col("ppos").isNotNull &&
        col("ppos") =!= col("rel"))
      .select(col("event_type"), col("day"),
        when(col("rel") === 1L, "golden").otherwise("death").as("cross_type"))
      .orderBy("event_type", "day")
  }

  // ----------------------------------------------------------------- OBV

  /** ON-BALANCE VOLUME — the classic volume-flow confirmation line under
    * [[taMacd]]'s price crossovers: each day's size total (Σ props.k, the
    * [[taVwap]] size field) signed by the close-to-close direction and
    * accumulated. Divergence between OBV and price is the textbook
    * early-warning read. ALL-INTEGER end to end: cent-close direction is
    * a three-way sign, the running sum a cumulative window over exact
    * longs — no doubles anywhere in this query. First day carries sign 0
    * (no prior close) in both engines. */
  def taObv(spark: SparkSession, dir: String): DataFrame =
    obvOf(table(spark, dir, "events"))

  private[graft] def obvOf(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(IntegerType)
    val ord = (unix_micros(col("ts")) % 86400000000L) * 1048576L +
      pmod(col("event_id"), lit(1048576L))
    val daily = events.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(floor(max_by(col("value"), ord) * 100 + 0.5).cast(LongType)
          .as("c"),
        coalesce(sum(k.cast(LongType)), lit(0L)).as("qty"))
    val wo = Window.partitionBy("event_type").orderBy("d")
    val wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("pc", lag(col("c"), 1).over(wo))
      .withColumn("sgn", when(col("pc").isNull, 0L)
        .when(col("c") > col("pc"), 1L)
        .when(col("c") < col("pc"), -1L).otherwise(0L))
      .select(col("event_type"), col("day"), col("qty"),
        sum(col("sgn") * col("qty")).over(wc).as("obv"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------------- Beta / Sharpe

  /** Quantized daily PPM RETURNS per type on the consecutive-present-day
    * (position) sequence: r = floor((c−c_prev)/c_prev · 1e6 + 0.5) with
    * exact cent closes. The two ints→double casts and the single IEEE
    * division are bit-identical in both engines, and floor (never
    * integer `div`, whose negative rounding differs between Spark trunc
    * and DuckDB floor) lands the ppm grid — the shared return frame
    * behind [[taBeta]] and [[taSharpe]]. */
  /** The shared (type, day, cent-close) frame — built ONCE per query so
    * the type and market branches hang off an identical agg subplan
    * (ReusedExchange dedupes the events scan + daily aggregate when
    * both appear in one plan, e.g. [[betaOf]]). */
  private def centsDailyOf(events: DataFrame): DataFrame =
    dailyCloseOf(events)
      .withColumn("c", floor(col("close") * 100 + 0.5).cast(LongType))

  private[graft] def typeReturnsOf(events: DataFrame): DataFrame =
    typeReturnsFrom(centsDailyOf(events))

  private def typeReturnsFrom(centsDaily: DataFrame): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("d")
    centsDaily
      .withColumn("cp", lag(col("c"), 1).over(wo))
      .filter(col("cp").isNotNull && col("cp") =!= 0L)
      .select(col("event_type"), col("d"),
        floor((col("c") - col("cp")).cast(DoubleType) /
          col("cp").cast(DoubleType) * 1e6 + 0.5).cast(LongType).as("r"))
  }

  /** The composite "market" series: Σ over types of the day's cent close
    * (an equal-weight index on exact integers), then the same ppm return
    * quantization. The lag runs over a GLOBAL window — deliberate: the
    * frame is the aggregated |days| rows, the documented
    * dimension-bounded class (dq_volume/dq_entropy), never raw events. */
  private def marketReturnsFrom(centsDaily: DataFrame): DataFrame = {
    val wo = Window.orderBy("d")
    centsDaily
      .groupBy("d").agg(sum(col("c")).as("mc"))
      .withColumn("mp", lag(col("mc"), 1).over(wo))
      .filter(col("mp").isNotNull && col("mp") =!= 0L)
      .select(col("d"),
        floor((col("mc") - col("mp")).cast(DoubleType) /
          col("mp").cast(DoubleType) * 1e6 + 0.5).cast(LongType).as("rm"))
  }

  /** MARKET BETA per type — the OLS slope of the type's daily ppm return
    * on the composite market's: the systematic-risk number under every
    * hedge ratio and factor screen. Moments (n, Σx, Σy, Σxy, Σx²) ride
    * DECIMAL(38,0) (ppm² products brush int64 — the [[graft.ops.EventOps
    * .abTtest]] convention), cast to double ONCE, and β derives in a
    * single scalar tree (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²), NULL on a
    * zero-variance market via nullif. Plan: two daily aggregates, a
    * broadcast-sized |days| join, one final |types| aggregate. */
  def taBeta(spark: SparkSession, dir: String): DataFrame =
    betaOf(table(spark, dir, "events"))

  private[graft] def betaOf(events: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val dec18 = DecimalType(18, 0)
    val cd = centsDailyOf(events)
    val m = typeReturnsFrom(cd)
      .join(broadcast(marketReturnsFrom(cd)), "d")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("rm").cast(dec38)).as("sx"),
        sum(col("r").cast(dec38)).as("sy"),
        sum((col("rm").cast(dec18) * col("r").cast(dec18)).cast(dec38))
          .as("sxy"),
        sum((col("rm").cast(dec18) * col("rm").cast(dec18)).cast(dec38))
          .as("sxx"))
    val (nd, sx, sy, sxy, sxx) =
      (col("n_days").cast(DoubleType), col("sx").cast(DoubleType),
        col("sy").cast(DoubleType), col("sxy").cast(DoubleType),
        col("sxx").cast(DoubleType))
    m.select(col("event_type"), col("n_days"),
        roundD((nd * sxy - sx * sy) /
          nullif(nd * sxx - sx * sx, lit(0.0)), 6).as("beta"))
      .orderBy("event_type")
  }

  /** SHARPE RATIO per type — annualized mean/σ of the daily ppm return
    * (√252 trading days), the risk-adjusted-return headline. Same
    * DECIMAL(38,0) moments as [[betaOf]]; mean, sample σ and the ratio
    * are ONE double tree on the cast moments (greatest(…,0) guards the
    * σ rounding edge, nullif the flat series and the n<2 warm-up —
    * NULL, never NaN, in both engines). */
  def taSharpe(spark: SparkSession, dir: String): DataFrame =
    sharpeOf(table(spark, dir, "events"))

  private[graft] def sharpeOf(events: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val dec18 = DecimalType(18, 0)
    val m = typeReturnsOf(events)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("r").cast(dec38)).as("sx"),
        sum((col("r").cast(dec18) * col("r").cast(dec18)).cast(dec38))
          .as("sxx"))
    val (nd, sx, sxx) = (col("n_days").cast(DoubleType),
      col("sx").cast(DoubleType), col("sxx").cast(DoubleType))
    val mean = sx / nd / lit(1e6)
    val sd = sqrt(greatest((nd * sxx - sx * sx) /
      nullif(nd * (nd - lit(1.0)), lit(0.0)), lit(0.0))) / lit(1e6)
    m.select(col("event_type"), col("n_days"),
        roundD(mean, 6).as("mean_ret"),
        roundD(sd, 6).as("sd_ret"),
        roundD(mean / nullif(sd, lit(0.0)) * sqrt(lit(252.0)), 6)
          .as("sharpe"))
      .orderBy("event_type")
  }

  // -------------------------------------------------------------- wiring

  /** EMA tap-sum SQL shared by the [[taMacd]] oracle — same tap count and
    * decay literals as the Spark side ([[TimeWindows]] ewmaOracle shape).
    * Weight literals carry an exponent suffix so DuckDB LEXES them as
    * DOUBLE: a bare 17-digit decimal literal parses as DECIMAL(18,17)
    * there, and the 16-term slow-EMA denominator overflows DECIMAL(18)
    * addition (observed) — and decimal→double re-rounding could differ
    * from the direct shortest-round-trip double parse besides. */
  private def dbl(v: Double): String = {
    val s = v.toString
    if (s.contains("e") || s.contains("E")) s else s + "e0"
  }

  private def emaSql(src: String, k: Int, d: Double, over: String): String = {
    val num = (0 until k).map(j =>
      s"coalesce(lag($src, $j) $over, 0.0) * ${dbl(math.pow(d, j))}").mkString(" + ")
    val den = (0 until k).map(j =>
      s"CASE WHEN lag($src, $j) $over IS NOT NULL THEN ${dbl(math.pow(d, j))} ELSE 0.0 END")
      .mkString(" + ")
    s"($num) / ($den)"
  }

  /** Shared return-frame SQL behind the ta_beta/ta_sharpe oracles — the
    * same floor-quantized ppm grid as [[typeReturnsOf]] (floor, never
    * integer division: `//` floors in DuckDB while Spark's `div`
    * truncates, and returns go negative). */
  private val typeReturnsSql: String = s"""
      dc AS ($dailyCloseSql),
      cc AS (SELECT event_type, d,
                    CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      tr AS (SELECT event_type, d,
                    CAST(floor((c - cp)::DOUBLE / cp::DOUBLE * 1e6 + 0.5)
                         AS BIGINT) AS r
             FROM (SELECT event_type, d, c,
                          lag(c) OVER (PARTITION BY event_type ORDER BY d)
                            AS cp
                   FROM cc)
             WHERE cp IS NOT NULL AND cp <> 0)"""

  val oracles: Map[String, String] = Map(
    // same HUGEINT moments (Spark: DECIMAL(38,0)), same single double
    // tree for the OLS slope, same 1e-6 floor-round
    "ta_beta" -> s"""
      WITH $typeReturnsSql,
      mk AS (SELECT d, CAST(sum(c) AS BIGINT) AS mc FROM cc GROUP BY 1),
      mr AS (SELECT d,
                    CAST(floor((mc - mp)::DOUBLE / mp::DOUBLE * 1e6 + 0.5)
                         AS BIGINT) AS rm
             FROM (SELECT d, mc, lag(mc) OVER (ORDER BY d) AS mp FROM mk)
             WHERE mp IS NOT NULL AND mp <> 0),
      m AS (SELECT event_type, count(*) AS n_days,
                   CAST(sum(CAST(rm AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(sum(CAST(tr.r AS HUGEINT)) AS HUGEINT) AS sy,
                   CAST(sum(CAST(rm AS HUGEINT) * tr.r) AS HUGEINT) AS sxy,
                   CAST(sum(CAST(rm AS HUGEINT) * rm) AS HUGEINT) AS sxx
            FROM tr JOIN mr USING (d) GROUP BY 1)
      SELECT event_type, n_days,
             floor((n_days::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / nullif(n_days::DOUBLE * sxx::DOUBLE
                            - sx::DOUBLE * sx::DOUBLE, 0e0)
                   * 1e6 + 0.5) / 1e6 AS beta
      FROM m ORDER BY event_type""",
    // same moments; mean, sample sigma and the annualized ratio replay the
    // identical greatest/nullif-guarded tree
    "ta_sharpe" -> s"""
      WITH $typeReturnsSql,
      m AS (SELECT event_type, count(*) AS n_days,
                   CAST(sum(CAST(r AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sxx
            FROM tr GROUP BY 1)
      SELECT event_type, n_days,
             floor(sx::DOUBLE / n_days::DOUBLE / 1e6 * 1e6 + 0.5) / 1e6
               AS mean_ret,
             floor(sqrt(greatest(
                     (n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                     / nullif(n_days::DOUBLE * (n_days::DOUBLE - 1e0), 0e0),
                     0e0)) / 1e6 * 1e6 + 0.5) / 1e6 AS sd_ret,
             floor(sx::DOUBLE / n_days::DOUBLE / 1e6
                   / nullif(sqrt(greatest(
                       (n_days::DOUBLE * sxx::DOUBLE
                        - sx::DOUBLE * sx::DOUBLE)
                       / nullif(n_days::DOUBLE * (n_days::DOUBLE - 1e0),
                                0e0),
                       0e0)) / 1e6, 0e0)
                   * sqrt(252e0) * 1e6 + 0.5) / 1e6 AS sharpe
      FROM m ORDER BY event_type""",
    // same integer first/last/peak machinery, same linear annualization
    // (deliberately no pow — libm results are not pinned cross-engine)
    "ta_calmar" -> s"""
      WITH dc AS ($dailyCloseSql),
      c AS (SELECT event_type, d,
                   CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      w AS (SELECT event_type, d, c,
                   max(c) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS peak
            FROM c),
      dd AS (SELECT event_type, d, c,
                    floor((peak - c)::DOUBLE / nullif(peak, 0)::DOUBLE
                          * 1e6 + 0.5) / 1e6 AS dd
             FROM w),
      m AS (SELECT event_type, count(*) AS n_days,
                   arg_min(c, d) AS cf, arg_max(c, d) AS cl,
                   max(dd) AS max_dd
            FROM dd GROUP BY 1)
      SELECT event_type, n_days,
             floor((cl::DOUBLE / cf::DOUBLE - 1.0) * 252.0
                   / n_days::DOUBLE * 1e6 + 0.5) / 1e6 AS ann_ret,
             max_dd,
             floor((cl::DOUBLE / cf::DOUBLE - 1.0) * 252.0
                   / n_days::DOUBLE / nullif(max_dd, 0e0)
                   * 1e6 + 0.5) / 1e6 AS calmar
      FROM m ORDER BY event_type""",
    "ta_vwap" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                count(*) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS qty,
                floor(CAST(SUM(CAST(value AS DECIMAL(18,2))
                               * CAST(json_extract_string(props, '$.k') AS INTEGER))
                           AS DOUBLE)
                      / CAST(nullif(SUM(CAST(json_extract_string(props, '$.k')
                                             AS BIGINT)), 0) AS DOUBLE)
                      * 1e6 + 0.5) / 1e6 AS vwap
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",
    "ta_bollinger" -> s"""
      WITH dc AS ($dailyCloseSql),
      c AS (SELECT event_type, d, day, close,
                   CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      w AS (SELECT event_type, day, close,
                   count(*) OVER win AS n,
                   CAST(sum(c) OVER win AS DOUBLE) AS sx,
                   CAST(sum(c * c) OVER win AS DOUBLE) AS sxx
            FROM c WINDOW win AS (PARTITION BY event_type ORDER BY d
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
      b AS (SELECT event_type, day, close, n,
                   sx / CAST(n AS DOUBLE) / 100.0 AS ma,
                   sqrt(greatest((sxx * CAST(n AS DOUBLE) - sx * sx)
                                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)),
                                 0.0)) / 100.0 AS sd
            FROM w WHERE n >= 2)
      SELECT event_type, day, close, n,
             floor(ma * 1e6 + 0.5) / 1e6 AS ma,
             floor(sd * 1e6 + 0.5) / 1e6 AS sd,
             floor((ma + 2.0 * sd) * 1e6 + 0.5) / 1e6 AS upper,
             floor((ma - 2.0 * sd) * 1e6 + 0.5) / 1e6 AS lower,
             CAST(close > ma + 2.0 * sd OR close < ma - 2.0 * sd AS INTEGER)
               AS breach
      FROM b ORDER BY event_type, day""",
    "ta_rsi" -> s"""
      WITH dc AS ($dailyCloseSql),
      c AS (SELECT event_type, d, day,
                   CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      dlt AS (SELECT event_type, d, day,
                     c - lag(c, 1) OVER (PARTITION BY event_type ORDER BY d)
                       AS delta
              FROM c),
      g AS (SELECT event_type, day,
                   CAST(sum(greatest(delta, 0)) OVER win AS BIGINT) AS gain7,
                   CAST(sum(greatest(-delta, 0)) OVER win AS BIGINT) AS loss7,
                   count(*) OVER win AS m
            FROM dlt WHERE delta IS NOT NULL
            WINDOW win AS (PARTITION BY event_type ORDER BY d
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_type, day, gain7, loss7,
             floor(100.0 * CAST(gain7 AS DOUBLE)
                   / CAST(nullif(gain7 + loss7, 0) AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS rsi
      FROM g WHERE m = 7 ORDER BY event_type, day""",
    "ta_macd" -> {
      val over = "OVER (PARTITION BY event_type ORDER BY d)"
      s"""WITH dc AS ($dailyCloseSql),
      e AS (SELECT event_type, d, day,
                   floor((${emaSql("close", macdFastK, macdFastD, over)})
                         * 1e6 + 0.5) / 1e6 AS ema_fast,
                   floor((${emaSql("close", macdSlowK, macdSlowD, over)})
                         * 1e6 + 0.5) / 1e6 AS ema_slow
            FROM dc),
      m AS (SELECT event_type, d, day, ema_fast, ema_slow,
                   floor((ema_fast - ema_slow) * 1e6 + 0.5) / 1e6 AS macd
            FROM e),
      s AS (SELECT event_type, day, ema_fast, ema_slow, macd,
                   floor((${emaSql("macd", macdSigK, macdSigD, over)})
                         * 1e6 + 0.5) / 1e6 AS signal
            FROM m)
      SELECT event_type, day, ema_fast, ema_slow, macd, signal,
             floor((macd - signal) * 1e6 + 0.5) / 1e6 AS hist
      FROM s ORDER BY event_type, day"""
    },
    "ta_drawdown" -> s"""
      WITH dc AS ($dailyCloseSql),
      c AS (SELECT event_type, d, day,
                   CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      p AS (SELECT event_type, d, day, c,
                   max(c) OVER (PARTITION BY event_type ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS peak
            FROM c),
      dd AS (SELECT event_type, d,
                    floor(CAST(peak - c AS DOUBLE)
                          / CAST(nullif(peak, 0) AS DOUBLE) * 1e6 + 0.5) / 1e6
                      AS dd,
                    max(floor(CAST(peak - c AS DOUBLE)
                          / CAST(nullif(peak, 0) AS DOUBLE) * 1e6 + 0.5) / 1e6)
                      OVER (PARTITION BY event_type) AS max_dd,
                    count(*) OVER (PARTITION BY event_type) AS n_days
             FROM p)
      SELECT event_type, max(n_days) AS n_days, max(dd) AS max_dd,
             strftime(make_timestamp(min(d) * 86400000000), '%Y-%m-%d')
               AS trough_day
      FROM dd WHERE dd = max_dd GROUP BY 1 ORDER BY event_type""",
    "ta_atr" -> s"""
      WITH dc AS ($dailyOhlcSql),
      t AS (SELECT event_type, d, day, hi, lo, cl,
                   coalesce(lag(cl, 1) OVER (PARTITION BY event_type
                                             ORDER BY d), cl) AS pc
            FROM dc),
      tr AS (SELECT event_type, d, day,
                    greatest(hi - lo, abs(hi - pc), abs(lo - pc)) AS tr
             FROM t)
      SELECT event_type, day,
             CAST(tr AS DOUBLE) / 100.0 AS tr,
             floor(CAST(sum(tr) OVER win AS DOUBLE)
                   / CAST(count(*) OVER win AS DOUBLE) / 100.0 * 1e6 + 0.5)
               / 1e6 AS atr
      FROM tr WINDOW win AS (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, day""",
    "ta_stoch" -> s"""
      WITH dc AS ($dailyOhlcSql),
      w AS (SELECT event_type, day, cl,
                   min(lo) OVER win AS l7, max(hi) OVER win AS h7
            FROM dc WINDOW win AS (PARTITION BY event_type ORDER BY d
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_type, day, CAST(cl AS DOUBLE) / 100.0 AS close,
             floor(100.0e0 * CAST(cl - l7 AS DOUBLE)
                   / CAST(nullif(h7 - l7, 0) AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS pct_k
      FROM w ORDER BY event_type, day""",
    "ta_sma_cross" -> s"""
      WITH dc AS ($dailyCloseSql),
      c AS (SELECT event_type, d, day,
                   CAST(floor(close * 100 + 0.5) AS BIGINT) AS c FROM dc),
      w AS (SELECT event_type, d, day,
                   CAST(sum(c) OVER w3 AS BIGINT) AS sf,
                   count(*) OVER w3 AS nf,
                   CAST(sum(c) OVER w7 AS BIGINT) AS ss,
                   count(*) OVER w7 AS ns
            FROM c WINDOW
              w3 AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
              w7 AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      r AS (SELECT event_type, d, day,
                   CASE WHEN sf * ns > ss * nf THEN 1
                        WHEN sf * ns < ss * nf THEN -1 ELSE 0 END AS rel
            FROM w),
      x AS (SELECT event_type, day, rel,
                   last_value(nullif(rel, 0) IGNORE NULLS) OVER (
                     PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS ppos
            FROM r)
      SELECT event_type, day,
             CASE WHEN rel = 1 THEN 'golden' ELSE 'death' END AS cross_type
      FROM x WHERE rel <> 0 AND ppos IS NOT NULL AND ppos <> rel
      ORDER BY event_type, day""",
    "ta_obv" -> """
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS d,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(floor(arg_max(value,
                      (epoch_us(ts) % 86400000000) * 1048576
                      + (event_id % 1048576)) * 100 + 0.5) AS BIGINT) AS c,
               CAST(coalesce(sum(CAST(json_extract_string(props, '$.k')
                                      AS BIGINT)), 0) AS BIGINT) AS qty
        FROM events GROUP BY 1, 2, 3),
      s AS (SELECT event_type, d, day, qty,
                   CASE WHEN lag(c, 1) OVER w IS NULL THEN 0
                        WHEN c > lag(c, 1) OVER w THEN 1
                        WHEN c < lag(c, 1) OVER w THEN -1 ELSE 0 END AS sgn
            FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
      SELECT event_type, day, qty,
             CAST(sum(sgn * qty) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS obv
      FROM s ORDER BY event_type, day""",
    "ta_rv" ->
      """WITH r AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(floor((value / nullif(lag(value, 1) OVER (
                          PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                          ORDER BY ts, event_id), 0.0) - 1.0)
                        * 1e6 + 0.5) AS BIGINT) AS ri
           FROM events)
         SELECT event_type, day, count(ri) AS n_ret,
                floor(sqrt(CAST(SUM(CAST(ri AS HUGEINT) * ri) AS DOUBLE))
                      / 1e6 * 1e6 + 0.5) / 1e6 AS rv
         FROM r GROUP BY 1, 2 ORDER BY event_type, day""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_vwap" -> taVwap _,
    "ta_bollinger" -> taBollinger _,
    "ta_rsi" -> taRsi _,
    "ta_macd" -> taMacd _,
    "ta_drawdown" -> taDrawdown _,
    "ta_rv" -> taRv _,
    "ta_atr" -> taAtr _,
    "ta_stoch" -> taStoch _,
    "ta_obv" -> taObv _,
    "ta_beta" -> taBeta _,
    "ta_calmar" -> taCalmar _,
    "ta_sharpe" -> taSharpe _,
    "ta_sma_cross" -> taSmaCross _)
}
