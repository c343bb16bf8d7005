package graft.ops

import graft.SparkSpec

/** PageRank invariants the oracle hash can't isolate: fixed points on
  * hand-built graphs, mass conservation, and partition-order independence
  * of the quantized iteration. */
class GraphOpsSpec extends SparkSpec {

  test("pagerank: a symmetric 2-cycle is a fixed point at rank 1.0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = GraphOps.pageRankOf(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // each node receives exactly its own emitted mass every iteration:
    // 0.15 + 0.85 * 1.0 = 1.0 — any drift means the contribution sum or
    // the damping update is wrong
    assert(pr == Map(1L -> 1.0, 2L -> 1.0), s"2-cycle drifted: $pr")
  }

  test("pagerank: a star graph concentrates rank on the hub") {
    import spark.implicits._
    // 4 leaves all pointing at node 0; node 0 points at leaf 1
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val pr = GraphOps.pageRankOf(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) && pr(1L) > pr(2L),
      s"hub must outrank the pointed-at leaf, which outranks plain leaves: $pr")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L),
      s"symmetric leaves must tie exactly (quantized sums): $pr")
  }

  test("pagerank: nation graph — ranks positive, identical across partitionings") {
    val dir = "/root/testdata/sf0.001"
    val a = GraphOps.pageRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(a.nonEmpty && a.forall(_._2 > 0.0))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = GraphOps.pageRank(spark, dir).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(a.toSeq == b.toSeq,
        "quantized iteration must be partition-order independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
