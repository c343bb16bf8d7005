package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

import graft.SparkSpec
import graft.functions.GraftExtensions
import graft.ops.table

/** Specs for the union-of-disjoint-filters optimizer rule: the rewrite
  * itself (soundness gates included) and the end-to-end injection through
  * SparkSessionExtensions with a single-scan plan assertion. */
class MergeUnionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def scans(p: String): Int = "Scan parquet".r.findAllMatchIn(p).size

  test("rule merges equality branches over one source into a single IN scan") {
    val ev = table(spark, dir, "events")
    val u = ev.filter(col("event_type") === "click")
      .union(ev.filter(col("event_type") === "view"))
      .union(ev.filter(col("event_type") === "purchase"))
    val merged = MergeDisjointFilterUnions(
      org.apache.spark.sql.catalyst.plans.logical.Union(Seq(
        ev.filter(col("event_type") === "click").queryExecution.analyzed,
        ev.filter(col("event_type") === "view").queryExecution.analyzed,
        ev.filter(col("event_type") === "purchase").queryExecution.analyzed)))
    // the rewritten plan has no Union left and executes to the same rows
    assert(merged.collect {
      case _: org.apache.spark.sql.catalyst.plans.logical.Union => ()
    }.isEmpty, s"Union survived:\n$merged")
    val got = Bridge.ofRows(spark, merged).count()
    assert(got == u.count() && got > 0)
  }

  test("rule merges branches from independent reads of the same table") {
    def branch(v: String) =
      table(spark, dir, "events").filter(col("event_type") === v)
        .queryExecution.analyzed
    val merged = MergeDisjointFilterUnions(
      org.apache.spark.sql.catalyst.plans.logical.Union(Seq(
        branch("click"), branch("view"))))
    assert(merged.collect {
      case _: org.apache.spark.sql.catalyst.plans.logical.Union => ()
    }.isEmpty, s"Union survived:\n$merged")
    val ev = table(spark, dir, "events")
    assert(Bridge.ofRows(spark, merged).count() ==
      ev.filter(col("event_type").isin("click", "view")).count())
  }

  test("soundness gates: overlapping literals and non-eq branches stay unions") {
    val ev = table(spark, dir, "events")
    def f(v: String) = ev.filter(col("event_type") === v).queryExecution.analyzed
    // duplicate literal: bag semantics would double rows — must not merge
    val dup = MergeDisjointFilterUnions(
      org.apache.spark.sql.catalyst.plans.logical.Union(Seq(f("click"), f("click"))))
    assert(dup.collect {
      case _: org.apache.spark.sql.catalyst.plans.logical.Union => ()
    }.nonEmpty)
    // non-equality branch — must not merge
    val range = ev.filter(col("value") > 10).queryExecution.analyzed
    val mixed = MergeDisjointFilterUnions(
      org.apache.spark.sql.catalyst.plans.logical.Union(Seq(f("click"), range)))
    assert(mixed.collect {
      case _: org.apache.spark.sql.catalyst.plans.logical.Union => ()
    }.nonEmpty)
  }

  test("extension-installed rule collapses a 3-branch union to one file scan") {
    // builder extensions are ignored when a default session exists, so
    // temporarily clear it and build a fresh session on the shared context
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.caseSensitive", "true")
        .getOrCreate()
      val ev = table(s2, dir, "events")
      val u = ev.filter(col("event_type") === "click")
        .union(ev.filter(col("event_type") === "view"))
        .union(ev.filter(col("event_type") === "purchase"))
      val p = u.queryExecution.executedPlan.toString
      assert(scans(p) == 1, s"expected one scan after the merge rule:\n$p")
      assert(u.count() ==
        ev.filter(col("event_type").isin("click", "view", "purchase")).count())
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
