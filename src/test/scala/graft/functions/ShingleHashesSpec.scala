package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{pinned, DedupOps, TextOps}

/** Specs for the fused shingle_hashes expression: element-exact parity with
  * the five-stage interpreted chain it replaced, on the real documents
  * corpus (every dedup oracle depends on these values). */
class ShingleHashesSpec extends SparkSpec {

  private val M = 1000000007L
  private val dir = "/root/testdata/sf0.001"

  /** The pre-round-3 interpreted formulation, kept here as the reference. */
  private def chainSh(df: org.apache.spark.sql.DataFrame) = {
    def combine(th: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (((element_at(th, i) * 31 + element_at(th, i + 1)) % M * 31
        + element_at(th, i + 2)) % M * 31
        + element_at(th, i + 3)) % M
    df.select(col("doc_id"),
        pinned(transform(TextOps.tokens(col("text")), t => DedupOps.polyHash(t))).as("th"))
      .filter(size(col("th")) >= 4)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("th")) - 3),
          i => combine(col("th"), i))).as("sh"))
  }

  test("element-exact parity with the interpreted chain on the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fused = DedupOps.shingleArrays(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val chain = chainSh(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet == chain.keySet, "row filter (>=4 tokens) diverged")
    assert(fused.nonEmpty)
    fused.foreach { case (id, sh) =>
      assert(sh == chain(id), s"doc $id shingle ids diverged")
    }
  }

  test("edge shapes: short docs empty, repeated spaces and case folding") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three"),             // 3 tokens -> no shingles
      (2L, "a b c d"),                   // exactly one shingle
      (3L, "A  B   c D"),                // empty tokens dropped, lowercased
      (4L, "x y z w x y z w x y z w"))   // repeats -> distinct keeps firsts
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), ShingleHashes(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).size == 1)
    assert(out(3L) == out(2L), "case and extra spaces must not change ids")
    // 12 tokens -> 9 shingle positions over a period-4 sequence -> 4 distinct
    assert(out(4L).size == 4)
  }

  test("width parameter: n=8 folds eight token hashes, sub-width docs empty") {
    import spark.implicits._
    val toks = (1 to 9).map(i => s"w$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, toks.take(7).mkString(" ")))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), ShingleHashes(col("text"), 8).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(2L).isEmpty, "7 tokens yield no width-8 shingle")
    assert(out(1L).size == 2, "9 tokens yield two width-8 positions")
    // hand-fold the first shingle: acc seeded with h(w1), then *31+h(wk)
    def h(s: String) = s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % M)
    val expect = toks.take(8).map(h).reduceLeft((a, b) => (a * 31 + b) % M)
    assert(out(1L).head == expect)
  }

  test("stays inside the codegen stage (reference call, no interpreted lambdas)") {
    val plan = spark.read.parquet(s"$dir/documents.parquet")
      .select(ShingleHashes(col("text")).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [shingle_hashes"))
  }
}
