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

  test("triangles: K4 gives every vertex 3; a path gives all zeros") {
    import spark.implicits._
    // K4: C(4,3) = 4 triangles, each vertex in exactly 3 — and the input
    // arrives DIRECTED with duplicates/self-loops to prove the
    // undirect+dedup front end (each undirected edge once per direction)
    val k4 = (for {
      i <- 0L to 3L; j <- 0L to 3L if i != j
    } yield (i, j)).toSeq ++ Seq((1L, 1L), (2L, 3L))
    val got = GraphOps.triangleCountOf(k4.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"K4 triangle counts wrong: $got")
    // triangle-free path 0-1-2-3: all vertices present, all zero
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val zeros = GraphOps.triangleCountOf(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zeros == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"path graph should be triangle-free: $zeros")
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
