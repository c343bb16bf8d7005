package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** zorder_wide's layout contract: with keys far past the 16-bit mask (where
  * plain [[Extended.zorder]] truncation would alias key and key + 2^16 to
  * the same address), range-bucketed prefixes must still produce z-buckets
  * whose bounding boxes are TIGHT in both dimensions — each bucket is a
  * 16x16 tile of the 256x256 bucket grid, so a box may span at most 1/16th
  * of each key range plus one bucket of rounding. Tight boxes are the whole
  * value: they are the parquet row-group min/max stats a reader prunes
  * with. */
class ZorderWideSpec extends SparkSpec {

  test("bounding boxes stay tight in both dimensions on wide keys") {
    val rows = Extended.zorderWide(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    def span(lo: String, hi: String): Long = {
      val mn = rows.map(_.getAs[Long](lo)).min
      val mx = rows.map(_.getAs[Long](hi)).max
      mx - mn
    }
    val pSpan = span("p_min", "p_max")
    val sSpan = span("s_min", "s_max")
    // the wide-key regime is actually exercised: keys exceed the 16-bit
    // domain the plain zorder masks to
    assert(rows.map(_.getAs[Long]("p_max")).max > 0xFFFFL)
    // 1/16 of the range per dimension + one 1/256 bucket of rounding slack
    val pBound = pSpan / 16 + pSpan / 256 + 1
    val sBound = sSpan / 16 + sSpan / 256 + 1
    rows.foreach { r =>
      val pw = r.getAs[Long]("p_max") - r.getAs[Long]("p_min")
      val sw = r.getAs[Long]("s_max") - r.getAs[Long]("s_min")
      assert(pw <= pBound && sw <= sBound,
        s"zbucket ${r.get(0)} box ${pw}x$sw exceeds ${pBound}x$sBound - " +
          "keys are aliasing instead of clustering")
    }
  }
}
