package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Closed-form probes for the TA family — the invariants behind the plans
  * that the oracle hash compare can't express as directly: convexity of the
  * EMAs, the 0..100 RSI range, band ordering, drawdown's peak semantics,
  * and the exact values of hand-built series. */
class MarketOpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  // epoch-day-aligned base (1700006400000 ms = 19676 full days) so each
  // synthetic "day i" lands wholly inside one UTC day
  private val day0 = 1700006400000L
  private def at(day: Int, hour: Int) =
    new Timestamp(day0 + day * 86400000L + hour * 3600000L)

  /** (type, day index, hour, id, value) rows → the events frame the Of
    * functions consume. */
  private def frame(rows: Seq[(String, Int, Int, Long, Double)]) =
    rows.map { case (t, d, h, id, v) => (t, at(d, h), id, v) }
      .toDF("event_type", "ts", "event_id", "value")

  test("ta_bollinger: a constant series has zero sd and can never breach") {
    val rows = for (d <- 0 until 10) yield ("flat", d, 1, d.toLong, 5.0)
    val got = MarketOps.bollingerOf(frame(rows)).collect()
    assert(got.length == 9, s"warm-up row must drop: ${got.length}") // n>=2
    got.foreach { r =>
      assert(r.getAs[Double]("ma") == 5.0, s"$r")
      assert(r.getAs[Double]("sd") == 0.0, s"$r")
      assert(r.getAs[Double]("upper") == 5.0 && r.getAs[Double]("lower") == 5.0)
      assert(r.getAs[Int]("breach") == 0, s"constant series breached: $r")
    }
  }

  test("ta_bollinger: bands order lower <= ma <= upper on real data") {
    val b = MarketOps.taBollinger(spark, dir)
    assert(b.filter(col("lower") > col("ma") || col("ma") > col("upper"))
      .count() == 0L)
    assert(b.count() > 0)
  }

  test("ta_rsi: monotone rise reads 100, monotone fall reads 0") {
    val up = for (d <- 0 until 10) yield ("up", d, 1, d.toLong, 1.0 + d)
    val dn = for (d <- 0 until 10) yield ("dn", d, 1, d.toLong, 20.0 - d)
    val got = MarketOps.rsiOf(frame(up ++ dn)).collect()
    // 10 days -> 9 deltas -> rows with a full 7-delta window: 3 per type
    assert(got.length == 6, s"${got.length}")
    got.foreach { r =>
      val want = if (r.getString(0) == "up") 100.0 else 0.0
      assert(r.getAs[Double]("rsi") == want, s"$r")
    }
  }

  test("ta_rsi: range is [0, 100] on real data") {
    val r = MarketOps.taRsi(spark, dir)
    assert(r.filter(col("rsi") < 0.0 || col("rsi") > 100.0).count() == 0L)
    assert(r.count() > 0)
  }

  test("ta_macd: a constant series is a fixed point - both EMAs on the line, zero macd/signal/hist") {
    val rows = for (d <- 0 until 20) yield ("flat", d, 1, d.toLong, 4.0)
    val got = MarketOps.macdOf(frame(rows)).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getAs[Double]("ema_fast") == 4.0 &&
        r.getAs[Double]("ema_slow") == 4.0, s"$r")
      assert(r.getAs[Double]("macd") == 0.0 &&
        r.getAs[Double]("signal") == 0.0 &&
        r.getAs[Double]("hist") == 0.0, s"$r")
    }
  }

  test("ta_macd: EMAs stay inside the series envelope (convex combination)") {
    val m = MarketOps.taMacd(spark, dir)
    val env = table(spark, dir, "events").groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    assert(m.join(env, "event_type")
      .filter(col("ema_fast") < col("lo") - 1e-6 ||
        col("ema_fast") > col("hi") + 1e-6 ||
        col("ema_slow") < col("lo") - 1e-6 ||
        col("ema_slow") > col("hi") + 1e-6)
      .count() == 0L)
  }

  test("ta_drawdown: peak-to-trough of a hand-built path, earliest trough wins") {
    // closes: 1.00 2.00 4.00 1.00 3.00 -> running peak 4.00 from day 2 on,
    // dd = 0, 0, 0, .75, .25 -> max_dd .75 on day 3
    val vals = Seq(1.0, 2.0, 4.0, 1.0, 3.0)
    val rows = vals.zipWithIndex.map { case (v, d) => ("p", d, 1, d.toLong, v) }
    val got = MarketOps.drawdownOf(frame(rows)).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_days") == 5L, s"$r")
    assert(r.getAs[Double]("max_dd") == 0.75, s"$r")
    assert(r.getAs[String]("trough_day") ==
      at(3, 0).toLocalDateTime.toLocalDate.toString, s"$r")
  }

  test("ta_drawdown: dd in [0,1) and a rising series has zero drawdown") {
    val rows = for (d <- 0 until 8) yield ("rise", d, 1, d.toLong, 1.0 + d)
    val one = MarketOps.drawdownOf(frame(rows)).collect()(0)
    assert(one.getAs[Double]("max_dd") == 0.0)
    val real = MarketOps.taDrawdown(spark, dir)
    assert(real.filter(col("max_dd") < 0.0 || col("max_dd") >= 1.0)
      .count() == 0L)
    assert(real.count() > 0)
  }

  test("ta_rv: a +10% tick move reads vol 0.1; a single-fill day reads NULL") {
    val rows = Seq(
      ("s", 0, 1, 1L, 100.0), ("s", 0, 2, 2L, 110.0), // one return: +10%
      ("s", 1, 1, 3L, 50.0)) // single fill -> no return
    val got = MarketOps.rvOf(frame(rows)).collect()
      .map(r => r.getString(1) -> r).toMap
    val d0 = got(at(0, 0).toLocalDateTime.toLocalDate.toString)
    assert(d0.getAs[Long]("n_ret") == 1L && d0.getAs[Double]("rv") == 0.1, s"$d0")
    val d1 = got(at(1, 0).toLocalDateTime.toLocalDate.toString)
    assert(d1.getAs[Long]("n_ret") == 0L && d1.isNullAt(3), s"$d1")
  }

  test("ta_vwap: hand-weighted fills average exactly; qty conserves") {
    val rows = Seq(
      ("v", at(0, 1), 1L, 10.0, """{"k": 1}"""),
      ("v", at(0, 2), 2L, 20.0, """{"k": 3}"""))
      .toDF("event_type", "ts", "event_id", "value", "props")
    val got = MarketOps.vwapOf(rows).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("qty") == 4L, s"$r")
    assert(r.getAs[Double]("vwap") == 17.5, s"$r")
  }

  test("ta_atr: a constant series has zero range; a gap day charges the jump") {
    // days 0-4 flat at 5.00, day 5 gaps to 8.00 and stays flat intraday:
    // TR(5) = max(0, |8-5|, |8-5|) = 3.00
    val rows = (for (d <- 0 until 5) yield ("g", d, 1, d.toLong, 5.0)) :+
      (("g", 5, 1, 5L, 8.0))
    val got = MarketOps.atrOf(frame(rows)).collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val flatDay = at(0, 0).toLocalDateTime.toLocalDate.toString
    val gapDay = at(5, 0).toLocalDateTime.toLocalDate.toString
    assert(got(flatDay) == ((0.0, 0.0)), s"$got")
    assert(got(gapDay)._1 == 3.0, s"gap TR: ${got(gapDay)}")
    assert(got(gapDay)._2 == 0.5, s"6 zero-TRs + one 3.00 over 6 days: ${got(gapDay)}")
  }

  test("ta_stoch: close at the week's high reads 100, at its low reads 0, flat week reads NULL") {
    val up = for (d <- 0 until 8) yield ("up", d, 1, d.toLong, 1.0 + d)
    val dn = for (d <- 0 until 8) yield ("dn", d, 1, d.toLong, 20.0 - d)
    val fl = for (d <- 0 until 8) yield ("fl", d, 1, d.toLong, 7.0)
    val got = MarketOps.stochOf(frame(up ++ dn ++ fl)).collect()
    val day0 = at(0, 0).toLocalDateTime.toLocalDate.toString
    got.foreach { r =>
      // each series' first day is a one-row window: zero range, NULL
      if (r.getString(1) == day0 || r.getString(0) == "fl")
        assert(r.isNullAt(3), s"zero-range window must be NULL: $r")
      else r.getString(0) match {
        case "up" => assert(r.getDouble(3) == 100.0, s"$r")
        case "dn" => assert(r.getDouble(3) == 0.0, s"$r")
      }
    }
    assert(got.length == 24)
  }

  test("ta_obv: volume flows with the close direction, first day is flat") {
    import spark.implicits._
    // closes 1, 2, 2, 1 with qty 10 each: signs 0,+1,0,-1 -> obv 0,10,10,0
    val rows = Seq((0, 1.0), (1, 2.0), (2, 2.0), (3, 1.0)).map {
      case (d, v) => ("o", at(d, 1), d.toLong, v, """{"k": 10}""")
    }.toDF("event_type", "ts", "event_id", "value", "props")
    val got = MarketOps.obvOf(rows).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val days = (0 to 3).map(d => at(d, 0).toLocalDateTime.toLocalDate.toString)
    assert(got(days(0)) == 0L && got(days(1)) == 10L &&
      got(days(2)) == 10L && got(days(3)) == 0L, s"$got")
  }

  test("ta_sma_cross: rise-fall-rise fires death then golden; monotone and warm-up never fire") {
    // establish a +1 position on the rise, flip to -1 on the long fall
    // (death), flip back on the recovery (golden); a monotone series
    // holds one position forever and must stay silent — including its
    // warm-up days where the 3- and 7-day windows coincide (rel = 0)
    val n = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0,
      5.0, 4.0, 3.0, 2.0, 1.0,
      2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val rows = n.zipWithIndex.map { case (p, d) => ("n", d, 1, d.toLong, p) } ++
      (0 until 17).map(d => ("up", d, 1, d.toLong, 1.0 + d))
    val got = MarketOps.smaCrossOf(frame(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.forall(_._1 == "n"), s"monotone series fired: ${got.toSeq}")
    val kinds = got.map(_._3).toSeq
    assert(kinds.nonEmpty && kinds.head == "death", s"${got.toSeq}")
    assert(kinds.count(_ == "golden") >= 1, s"recovery never fired: ${got.toSeq}")
    kinds.sliding(2).foreach(p => if (p.length == 2)
      assert(p(0) != p(1), s"same-direction repeat: ${got.toSeq}"))
  }

  test("ta_vwap: sits inside the per-(type,day) price envelope on real data") {
    val v = MarketOps.taVwap(spark, dir)
    val env = table(spark, dir, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    assert(v.join(env, Seq("event_type", "day"))
      .filter(col("vwap") < col("lo") - 1e-6 || col("vwap") > col("hi") + 1e-6)
      .count() == 0L)
    assert(v.count() > 0)
  }

  test("ta_calmar: hand-built drawdown and linear annualization; flat series NULL") {
    // A: 100 -> 80 -> 120. peak 100,100,120; dd 0, 0.2, 0 -> max_dd 0.2
    // ann = (12000/10000 - 1) * 252 / 3 = 16.8; calmar = 16.8 / 0.2 = 84
    val ev = Seq(
      ("A", 1L, at(0, 1), 100.0), ("A", 2L, at(1, 1), 80.0),
      ("A", 3L, at(2, 1), 120.0),
      ("B", 4L, at(0, 1), 50.0), ("B", 5L, at(1, 1), 50.0))
      .toDF("event_type", "event_id", "ts", "value")
    val got = MarketOps.calmarOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got("A") == ((3L, 16.8, 0.2, Some(84.0))), s"$got")
    // no drawdown ever -> NULL calmar (never infinity), zero return
    assert(got("B") == ((2L, 0.0, 0.0, None)), s"$got")
  }

  test("ta_beta / ta_sharpe: match an independent moment evaluation; flat series NULLs") {
    // A: 100 -> 110 -> 99 (+10%, -10%); B: flat 50 — the market index is
    // the cent sum 15000, 16000, 14900
    val ev = Seq(
      ("A", 1L, at(0, 1), 100.0), ("A", 2L, at(1, 1), 110.0),
      ("A", 3L, at(2, 1), 99.0),
      ("B", 4L, at(0, 1), 50.0), ("B", 5L, at(1, 1), 50.0),
      ("B", 6L, at(2, 1), 50.0))
      .toDF("event_type", "event_id", "ts", "value")
    def ppm(c: Long, p: Long) =
      math.floor((c - p).toDouble / p.toDouble * 1e6 + 0.5).toLong
    val xs = Seq(ppm(16000, 15000), ppm(14900, 16000)) // market
    val ysA = Seq(ppm(11000, 10000), ppm(9900, 11000)) // +1e5, -1e5
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val n = 2.0
    val (sx, sy) = (xs.sum.toDouble, ysA.sum.toDouble)
    val sxy = xs.zip(ysA).map(t => t._1 * t._2).sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val wantBetaA = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    val beta = MarketOps.betaOf(ev).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(beta("A").contains(wantBetaA), s"$beta vs $wantBetaA")
    // B never moves: covariance 0 -> beta exactly 0
    assert(beta("B").contains(0.0), s"$beta")
    val sharpe = MarketOps.sharpeOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // A: mean return 0 -> sharpe exactly 0; B: sd 0 -> NULL, never NaN
    assert(sharpe("A") == ((0.0, Some(0.0))), s"$sharpe")
    assert(sharpe("B") == ((0.0, None)), s"$sharpe")
  }
}
