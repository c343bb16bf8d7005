package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Regression pins for the r14 idle-gap policy: an EventTimeTimeout only
  * RE-ARMS — carry state (prevClose/rings/funnel progress) survives the
  * idle horizon, so a key that resumes after a long-silent gap still
  * matches its batch twin row for row. Each test drives the timeout for
  * real: a second key advances the watermark past the 60-day horizon
  * while the key under test is silent (hasTimedOut is only delivered to
  * keys with no rows in the batch), then the silent key resumes. Under
  * the pre-r14 remove-on-timeout behavior every one of these fails:
  * ATR coalesces prev-close to the post-gap day's own close, Bollinger
  * forgets the pre-gap closes in its ±2σ window, and the windowed
  * funnel re-emits a duplicate step-1 row for a lapsed user. */
class StreamIdleGapSpec extends SparkSpec {

  private val base = 1700000000000L // 2023-11-14T22:13:20Z
  private def day(i: Int) = new java.sql.Timestamp(base + i * 86400000L)

  // key under test: closes 10.00, 11.00, ... on days 0..4, then a
  // 100-day silence, then days 104..106. "wm_pump" only exists to push
  // the watermark past day 4 + 60d while "k" is idle.
  private def taRows: (Seq[(String, Long, java.sql.Timestamp, Double)],
      Seq[(String, Long, java.sql.Timestamp, Double)],
      Seq[(String, Long, java.sql.Timestamp, Double)]) = {
    val before = (0 to 4).map(i =>
      ("k", i.toLong, day(i), 10.0 + i))
    val pump = Seq(("wm_pump", 100L, day(80), 1.0))
    val after = (104 to 106).map(i =>
      ("k", i.toLong, day(i), 20.0 + (i - 104)))
    (before, pump, after)
  }

  private def taParity(name: String,
      stream: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_],
      batch: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (before, pump, after) = taRows
    val mem = MemoryStream[(String, Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("event_type", "event_id", "ts", "value")
    val q = stream(events).toDF().writeStream.format("memory")
      .queryName(s"idlegap_$name").outputMode("append").start()
    try {
      mem.addData(before); q.processAllAvailable() // days 0..4 buffered
      mem.addData(pump); q.processAllAvailable()   // timeout fires for "k"
      mem.addData(after); q.processAllAvailable()  // "k" resumes post-gap
      mem.addData(("zz_sentinel", 0L, day(500), 0.0))
      q.processAllAvailable()                      // flush everything
      val got = spark.sql(s"SELECT * FROM idlegap_$name " +
        "WHERE event_type = 'k'").collect()
        .map(r => r.toSeq.toList).toSet
      val want = batch((before ++ pump ++ after)
        .toDF("event_type", "event_id", "ts", "value"))
        .filter($"event_type" === "k").collect()
        .map(r => r.toSeq.toList).toSet
      assert(got == want,
        s"$name diverged across the idle gap:\n stream-only: " +
          s"${(got diff want).take(3)}\n batch-only: ${(want diff got).take(3)}")
      assert(got.size >= 7, s"$name parity surface too small: ${got.size}")
    } finally q.stop()
  }

  test("atrStream: prevClose + TR ring survive a 100-day idle timeout") {
    taParity("atr", StreamAssembly.atrStream(_),
      graft.ops.MarketOps.atrOf)
  }

  test("bollingerStream: the cents ring survives a 100-day idle timeout") {
    taParity("boll", StreamAssembly.bollingerStream(_),
      graft.ops.MarketOps.bollingerOf)
  }

  test("ewmaStream: the trailing-close ring survives a 100-day idle timeout") {
    taParity("ewma", StreamAssembly.ewmaStream(_),
      graft.ops.TimeWindows.ewmaOf)
  }

  test("funnelWindowStream: a lapsed user's return does not re-emit step 1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "event_id", "ts", "event_type")
    val q = StreamAssembly.funnelWindowStream(events)
      .toDF().writeStream.format("memory").queryName("idlegap_funnel")
      .outputMode("append").start()
    try {
      // user 7 signs up on day 0, goes silent
      mem.addData(Seq((7L, 1L, day(0), "signup")))
      q.processAllAvailable()
      // another user pushes the watermark past day 0 + 60d -> timeout
      mem.addData(Seq((8L, 2L, day(80), "view")))
      q.processAllAvailable()
      // the lapsed user returns: signs up AGAIN, then converts in-window
      mem.addData(Seq(
        (7L, 3L, day(100), "signup"),
        (7L, 4L, day(101), "view"),
        (7L, 5L, day(102), "purchase")))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT step, ts_us FROM idlegap_funnel WHERE user_id = 7")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      // min-per-user semantics: step 1 is the DAY-0 signup (never the
      // day-100 duplicate), and steps 2/3 hang off the day-100 return
      // only if within 7 days of the ORIGINAL signup — they are not, so
      // exactly one row total, matching the batch twin
      val want = graft.ops.EventOps.funnelWindowOf(Seq(
        (7L, 1L, day(0), "signup"), (8L, 2L, day(80), "view"),
        (7L, 3L, day(100), "signup"), (7L, 4L, day(101), "view"),
        (7L, 5L, day(102), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type"))
      assert(got == Set((1, base * 1000L)),
        s"duplicate/late steps leaked across the idle gap: $got")
      // and the batch twin agrees: one step-1 user (7; 8 never signs up),
      // no step 2/3 — the day-100 events sit outside day-0's 7-day window
      val batchSteps = want.collect().map(r => r.getInt(0) -> r.getLong(2))
        .toMap
      assert(batchSteps == Map(1 -> 1L, 2 -> 0L, 3 -> 0L),
        s"batch twin drifted: $batchSteps")
    } finally q.stop()
  }
}
