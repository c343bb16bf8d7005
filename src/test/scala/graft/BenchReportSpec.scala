package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench report's size budget. The driver captures only the
  * last ~2000 characters of stdout; rounds 1-3 all recorded
  * `"parsed": null` because the full-precision one-line JSON overflowed
  * that window and its head (including the `{"metric"` anchor) was cut
  * off. The line must stay short enough that the WHOLE report plus sbt's
  * trailing `[success] Total time: ...` line (~80 chars) fits — adding
  * queries silently grows it, so the budget is enforced here. */
class BenchReportSpec extends AnyFunSuite {

  test("the bench JSON line fits the driver's 2000-char stdout capture") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val prefix = "[info] ".length
    val trailer = 85 // "[success] Total time: ..." + newlines
    // the normal regime — the %.1f rung — must fit outright, and "9.9" is
    // the exact per-value worst case there: Bench's mixed formatter prints
    // values >= 10s as whole seconds ("32", never wider than "9.9"), so no
    // stall can widen the line past this bound. (The %.2f opening rung
    // stopped fitting at 89 queries; deciseconds still expose the 3-20x
    // stall inflation the driver file is read for, and the 3-dp total is
    // unaffected.)
    val typical = names.map(n => s"\"$n\":9.9").mkString("{", ",", "}")
    val typicalLine =
      s"""{"metric":"total","value":9999.999,"unit":"sec","queries":$typical,"sf":"sf0.1"}"""
    assert(prefix + typicalLine.length + trailer <= 2000,
      s"typical bench line would be ${prefix + typicalLine.length + trailer} " +
        s"chars with ${names.length} queries - trim names or the driver " +
        "cannot parse the report")
    // the adaptive floor (%.0f, pathological 3-digit seconds everywhere)
    // must also fit — this is the last rung Bench degrades to
    val floor = names.map(n => s"\"$n\":999").mkString("{", ",", "}")
    val floorLine =
      s"""{"metric":"total","value":9999.999,"unit":"sec","queries":$floor,"sf":"sf0.1"}"""
    assert(prefix + floorLine.length + trailer <= 2000,
      s"even the %.0f fallback would overflow with ${names.length} queries " +
        s"(${prefix + floorLine.length + trailer} chars) - query names must shrink")
  }
}
