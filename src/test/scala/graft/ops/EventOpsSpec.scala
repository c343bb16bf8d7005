package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Funnel/retention semantics the oracle can't isolate: the strict
  * min-after-min ordering on hand-built event sequences, and the
  * cohort-diagonal invariants on the real table. */
class EventOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ts(s: Int) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("funnel: strict ordering — out-of-order steps never count") {
    import spark.implicits._
    // u1 completes in order; u2 purchased BEFORE viewing (no step 3);
    // u3 viewed before signing up and never after (stops at step 1);
    // u4 never signed up (counts nowhere).
    val ev = Seq(
      (1L, "signup", ts(10)), (1L, "view", ts(20)), (1L, "purchase", ts(30)),
      (2L, "signup", ts(10)), (2L, "purchase", ts(15)), (2L, "view", ts(20)),
      (3L, "view", ts(5)), (3L, "signup", ts(10)),
      (4L, "view", ts(1)), (4L, "purchase", ts(2)),
    ).toDF("user_id", "event_type", "ts")
    val got = EventOps.funnelOf(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel: equal timestamps are NOT strictly after (boundary)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "signup", ts(10)), (1L, "view", ts(10)), // same instant: no view
    ).toDF("user_id", "event_type", "ts")
    val got = EventOps.funnelOf(ev).collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 0L, 0L))
  }

  test("funnel: stage counts are monotone non-increasing on real data") {
    val counts = EventOps.funnel(spark, dir).collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel widened downstream: ${counts.toSeq}")
  }

  test("retention: offset-0 diagonal equals cohort size, offsets bounded") {
    val rows = EventOps.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every user is active on their own first day, so each cohort has an
    // offset-0 cell and it is the cohort's max (retention never exceeds it)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, cells) =>
      val day0 = cells.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $c missing its offset-0 cell")
      assert(cells.forall(_._3 <= day0.get._3),
        s"cohort $c has a retention cell above its own size")
    }
    assert(rows.forall(_._2 >= 0L), "negative day offset")
  }

  test("rfm: scores bounded 1..5, user mass conserved, monetary axis orders") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val cells = EventOps.rfm(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(cells.nonEmpty)
    cells.foreach { case (r, f, m, n, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5,
        s"score outside quintile range: ($r,$f,$m)")
      assert(n > 0L)
    }
    val purchasers = graft.ops.table(spark, d, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(cells.map(_._4).sum == purchasers,
      "cells must partition the purchaser set")
    // monetary score must order monetary mass per user: the m=5 stratum's
    // per-user average strictly exceeds the m=1 stratum's
    def avgCents(mScore: Int): Double = {
      val s = cells.filter(_._3 == mScore)
      s.map(_._5).sum.toDouble / s.map(_._4).sum
    }
    assert(avgCents(5) > avgCents(1),
      "m=5 users must out-spend m=1 users on average")
  }
}
