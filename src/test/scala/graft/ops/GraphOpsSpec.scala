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

  test("star CC: chain + pair + K3 resolve to min-rooted components") {
    import spark.implicits._
    // a 6-chain (deep path — exercises >1 contraction round), a 2-pair,
    // a triangle, all ids deliberately shuffled, edges fed in mixed
    // orientation with a duplicate
    val edges = Seq(
      (12L, 7L), (7L, 31L), (31L, 4L), (4L, 19L), (19L, 25L), // chain
      (99L, 41L), (41L, 99L), // pair, both orientations
      (60L, 55L), (55L, 50L), (50L, 60L) // triangle
    ).toDF("a", "b")
    val stars = GraphOps.starComponents(edges)
    val labs = stars.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val chain = Seq(12L, 7L, 31L, 19L, 25L)
    assert(chain.forall(v => labs(v) == 4L),
      s"chain must root at its min 4: $labs")
    assert(labs(99L) == 41L && labs(60L) == 50L && labs(55L) == 50L,
      s"pair/triangle roots wrong: $labs")
    // roots never appear as a non-root endpoint at convergence
    assert(!labs.contains(4L) && !labs.contains(41L) && !labs.contains(50L),
      s"a root leaked a non-root edge: $labs")
  }

  test("star CC agrees with min-label propagation on the co-purchase graph") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val cc = GraphOps.connectedComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.nonEmpty, "co-purchase graph empty at sf0.001")
    // independent algorithm, same answer: Extended.clusterLabels is
    // pointer-doubled min-label propagation over the symmetric edge set
    val e = GraphOps.starComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")) // touch the empty path too
    assert(e.isEmpty, "empty edge set must converge to zero star edges")
    val li = table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("l_partkey").as("a"),
        org.apache.spark.sql.functions.max("l_partkey").as("b"))
      .filter("n = 2 AND a <> b").select("a", "b")
    val sym = li.toDF("src", "dst")
      .unionByName(li.toDF("dst", "src").select("src", "dst"))
    val viaLabels = Extended.clusterLabels(sym).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == viaLabels,
      "star contraction and label propagation must produce identical components")
  }

  test("star CC == label propagation on random graphs (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // sparse random graphs over a small id space: mixtures of chains,
    // bridges, and isolated pairs, ids up to 1e6 to leave the packed-long
    // id range far behind
    val edgeGen = Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(0L, 60L)
        b <- Gen.choose(0L, 60L) if a != b
      } yield (a * 16384L + 7L, b * 16384L + 7L))
    }
    forAll(edgeGen) { es =>
      val df = es.toDF("a", "b")
      val stars = GraphOps.starComponents(df).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val viaStars = verts.map(v => v -> stars.getOrElse(v, v)).toMap
      val sym = df.toDF("src", "dst")
        .unionByName(df.toDF("dst", "src").select("src", "dst"))
      val viaLabels = Extended.clusterLabels(sym).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaStars == viaLabels
    }.check(org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15))
  }

  test("incremental CC: merge report matches a from-scratch recompute diff") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val incr = GraphOps.connectedComponentsIncr(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    assert(incr.nonEmpty, "delta landed no component changes — probe is vacuous")
    // from-scratch truth: label the FULL edge set, label the base edge set,
    // diff — computed with starComponents directly (not the incremental
    // composition), so agreement proves stars(base) + delta == base + delta
    val per = table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("a"), max("l_partkey").as("b"))
      .filter(col("n") === 2 && col("a") =!= col("b"))
    def labels(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val stars = GraphOps.starComponents(edges)
      val verts = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v"))).distinct()
      verts.join(stars.select(col("hi").as("v"), col("lo").as("c")),
          Seq("v"), "left")
        .select(col("v"), coalesce(col("c"), col("v")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val baseL = labels(per.filter(col("l_orderkey") % 10 =!= 7).select("a", "b"))
    val fullL = labels(per.select("a", "b"))
    val want = fullL.toSeq.collect {
      case (v, c) if !baseL.get(v).contains(c) => (v, baseL.get(v), c)
    }.sortBy(_._1)
    assert(incr.toSeq == want, "incremental merge report diverged from truth")
  }

  test("label prop: two bridged triangles resolve to two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.labelPropOf(sym, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-unrolled deterministic rounds (most-frequent, min on ties):
    // the bridge never merges the triangles
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"labels diverged: $got")
    assert(got.values.toSet.size == 2, "must keep two communities")
  }

  test("assortativity: a star is maximally disassortative; a cycle is NULL") {
    import spark.implicits._
    // hub 0 with 5 leaves: every edge pairs degree 5 with degree 1 -> r = -1
    val star = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val rStar = GraphOps.assortativityOf(star).collect().head
    assert(rStar.getLong(0) == 10L)
    assert(rStar.getDouble(1) == -1.0, s"star must be -1: $rStar")
    // 4-cycle: all degrees 2, zero variance -> NULL, never NaN
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("a", "b")
    val rCyc = GraphOps.assortativityOf(cyc).collect().head
    assert(rCyc.isNullAt(1), s"regular graph must yield NULL: $rCyc")
  }

  test("sssp: a cheap detour beats the expensive direct edge") {
    import spark.implicits._
    // 0→1 costs 10 direct, but 0→2→1 costs 1+2=3; 0→3 only via 1 (+1)
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val d = GraphOps.ssspOf(edges, hops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 4L),
      s"relaxation picked wrong paths: $d")
  }

  test("sssp: the hop budget bounds reach — and one more round extends it") {
    import spark.implicits._
    // chain 0→1→2→3→4→5, unit weights: 3 rounds reach ids 0..3 only
    val chain = (0L to 4L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val d3 = GraphOps.ssspOf(chain, hops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"3-hop budget must reach exactly ids 0..3: $d3")
    val d5 = GraphOps.ssspOf(chain, hops = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d5(5L) == 5L && d5.size == 6, s"5 hops must cover the chain: $d5")
  }

  test("betweenness: chain middles take full pair mass, parallel routes split it") {
    import spark.implicits._
    // chain 1→2→3→4: vertex 2 brokers (1,3) and (1,4); vertex 3 brokers
    // (1,4) and (2,4) — two full 10⁶ pair-masses each; endpoints zero
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val bc = GraphOps.betweennessOf(chain, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bc == Map(1L -> 0L, 2L -> 2000000L, 3L -> 2000000L, 4L -> 0L),
      s"chain betweenness wrong: $bc")
    // diamond 1→{2,3}→4: two equal shortest routes, σ_14 = 2 — each
    // middle carries (1·1·10⁶) div 2 = 500000 (the ppm mass splits)
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val bd = GraphOps.betweennessOf(diamond, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bd == Map(1L -> 0L, 2L -> 500000L, 3L -> 500000L, 4L -> 0L),
      s"parallel-route split wrong: $bd")
    // a direct 1→4 shortcut makes d(1,4)=1: no pair has an intermediary
    // on a SHORTEST path anymore — every vertex drops to zero
    val short = (Seq((1L, 4L)) ++ Seq((1L, 2L), (1L, 3L), (2L, 4L),
      (3L, 4L))).toDF("src", "dst")
    val bs = GraphOps.betweennessOf(short, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bs.values.forall(_ == 0L),
      s"off-shortest-path vertices must score zero: $bs")
  }

  test("betweenness: the nation query is deterministic and brokerage-positive") {
    val dir = "/root/testdata/sf0.001"
    val r1 = GraphOps.betweenness(spark, dir).collect().toSeq
    assert(r1.nonEmpty)
    // deterministic under re-run (the lane sparsifier's (cnt, dst) tie
    // break and the integer ppm arithmetic leave no float/order slack)
    assert(GraphOps.betweenness(spark, dir).collect().toSeq == r1)
    // the principal-lane skeleton is sparse enough that SOME nation
    // actually brokers a route (all-zero would mean the sparsifier is
    // not sparsifying and the operator is vacuous)
    assert(r1.exists(_.getLong(1) > 0L), s"no broker nation: $r1")
  }

  test("closeness: harmonic sums of floor'd pair ppm, unreachable scores zero") {
    import spark.implicits._
    // chain 1→2→3→4 (directed): from 1 the distances are 1,2,3 →
    // 10⁶ + 500000 + 333333; vertex 4 reaches nothing
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val c = GraphOps.closenessOf(chain, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(c == Map(
      1L -> ((3L, 1833333L)), 2L -> ((2L, 1500000L)),
      3L -> ((1L, 1000000L)), 4L -> ((0L, 0L))), s"harmonic sums wrong: $c")
    // the hop budget bounds reach: a 6-chain's head sees only 4 hops
    val six = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val c6 = GraphOps.closenessOf(six, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c6(1L) == 4L, s"hop budget must cap reach at 4: $c6")
  }

  test("katz: geometric walk weights accumulate at sinks, sources score zero") {
    import spark.implicits._
    // chain 1→2→3→4: with α=1/8 truncated at 4 hops, scaled by 8⁴ terms
    // are 8³ per length-1 walk, 8² per length-2, 8 per length-3. Vertex 2
    // receives one 1-walk (512); 3 receives one 1-walk + one 2-walk
    // (512+64); 4 one of each length 1..3 (512+64+8). Source 1 gets 0.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val k = GraphOps.katzOf(chain, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k == Map(1L -> 0L, 2L -> 512L, 3L -> 576L, 4L -> 584L),
      s"chain katz wrong: $k")
    // parallel walks ADD: a diamond 1→{2,3}→4 gives 4 two 2-walks
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val kd = GraphOps.katzOf(diamond, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kd(4L) == 2 * 512L + 2 * 64L,
      s"two direct walks + two 2-walks into the sink: $kd")
    // closed walks back to the SOURCE never score (aw drops s = t): on a
    // 2-cycle each vertex sees only the walks STARTING AT THE OTHER —
    // lengths 1 and 3 → 512 + 8
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val kc = GraphOps.katzOf(cyc, GraphOps.betwHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kc == Map(1L -> 520L, 2L -> 520L), s"2-cycle katz wrong: $kc")
  }

  test("kcore: a path peels to nothing; a triangle with a tail keeps the triangle") {
    import spark.implicits._
    // path 0-1-2-3-4 (canonical a<b): endpoints peel first, then inward —
    // the 2-core of a tree is empty, reached within the round budget
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val p = GraphOps.kCoreOf(path, k = 2, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(p.last == ((4, 0L, 0L)), s"tree 2-core must be empty: ${p.toSeq}")
    // round 1 drops exactly the two endpoints (deg 1)
    assert(p.head == ((1, 3L, 2L)), s"round 1 must keep {1,2,3}: ${p.toSeq}")
    // triangle 0-1-2 with tail 2-3-4: tail peels in 2 rounds, triangle stays
    val tri = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    val t = GraphOps.kCoreOf(tri, k = 2, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(t.last == ((4, 3L, 3L)), s"triangle must survive: ${t.toSeq}")
    val counts = t.map(r => (r._2, r._3))
    assert(counts(1) == counts(2) && counts(2) == counts(3),
      s"fixpoint must hold once the tail is gone: ${t.toSeq}")
  }

  test("kcore: co-purchase rounds converge inside the round budget") {
    // the fixed-round semantics are honest only if the budget REACHES the
    // fixpoint on real data — the sssp/khop convention, proven here
    val rows = GraphOps.kCore(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == GraphOps.kCoreRounds)
    assert(rows(rows.length - 2) == rows.last,
      s"last two rounds must agree (fixpoint): ${rows.toSeq}")
  }

  test("reciprocity: a 2-cycle scores 1, a DAG scores 0, self-loops don't count") {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("src", "dst")
    val c = GraphOps.reciprocityOf(cyc).collect()(0)
    assert((c.getLong(0), c.getLong(1), c.getDouble(2)) == ((2L, 2L, 1.0)),
      s"2-cycle: $c")
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val d = GraphOps.reciprocityOf(dag).collect()(0)
    assert((d.getLong(0), d.getLong(1), d.getDouble(2)) == ((3L, 0L, 0.0)),
      s"DAG: $d")
  }

  test("walks: hash-picked walks match an independent simulation and repeat bit-identically") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (4L, 5L))
    val df = edges.toDF("a", "b")
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).sorted }
    def simulate(start: Long): String = {
      var cur = start
      val sb = new StringBuilder(start.toString)
      for (t <- 1 to GraphOps.walkSteps) {
        val ns = adj(cur)
        val r = (((cur * 1000003L + t * 7919L + 12345L) % 1000000007L)
          % ns.size).toInt
        cur = ns(r)
        sb.append('-').append(cur)
      }
      sb.toString
    }
    val got = GraphOps.walksOf(df, GraphOps.walkSteps).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), s"one walk per vertex: $got")
    got.foreach { case (s, w) =>
      assert(w == simulate(s), s"walk from $s: got $w want ${simulate(s)}")
    }
    // a second run draws the identical corpus — hash, not RNG
    val again = GraphOps.walksOf(df, GraphOps.walkSteps).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("motifs: a 3-cycle is one cyclic triad; re-orienting one edge makes one FFL") {
    import spark.implicits._
    def census(pairs: (Long, Long)*) =
      GraphOps.motifsOf(pairs.toDF("src", "dst")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cyc = census((1L, 2L), (2L, 3L), (3L, 1L))
    assert(cyc == Map("cyclic" -> 1L, "ffl" -> 0L, "edge" -> 3L), s"3-cycle: $cyc")
    // flip 3->1 to 1->3: the same triple is now a feed-forward loop
    // (1->2, 2->3, 1->3) and no cycle survives
    val ffl = census((1L, 2L), (2L, 3L), (1L, 3L))
    assert(ffl == Map("cyclic" -> 0L, "ffl" -> 1L, "edge" -> 3L), s"FFL: $ffl")
    // both orientations of the closing edge: one cycle AND one FFL
    val both = census((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(both == Map("cyclic" -> 1L, "ffl" -> 1L, "edge" -> 4L), s"both: $both")
    // self-loops never fabricate a triad; absent classes still report 0
    val self = census((1L, 2L), (2L, 1L), (1L, 1L))
    assert(self == Map("cyclic" -> 0L, "ffl" -> 0L, "edge" -> 2L),
      s"2-cycle+self-loop: $self")
  }

  test("clustering: coefficient is consistent with the triangle and degree frames") {
    val r = GraphOps.clusteringCoef(spark, "/root/testdata/sf0.001").collect()(0)
    val (nv, nw, nt) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv > 0 && nw >= nt * 3,
      s"every triangle contributes 3 wedges: $r")
    val cc = Option(r.get(3)).map(_.asInstanceOf[Double])
    if (nw > 0) {
      val expect = math.floor(3.0 * nt / nw * 1e6 + 0.5) / 1e6
      assert(cc.contains(expect) && cc.get >= 0.0 && cc.get <= 1.0, s"$r")
    } else assert(cc.isEmpty, s"zero wedges must yield NULL: $r")
  }

  test("jaccard: shared-neighbor pairs score right, adjacent pairs are excluded") {
    import spark.implicits._
    // square 0-1-2-3-0: opposite corners share BOTH neighbors
    // (jac = 2/2 = 1000‰) and are non-adjacent; adjacent corners share
    // none here — every reported pair must be a diagonal
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("a", "b")
    val got = GraphOps.jaccardLinksOf(sq).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set((0L, 2L, 2L, 1000L), (1L, 3L, 2L, 1000L)),
      s"square diagonals wrong: ${got.toSeq}")
    // wedge 0-1-2 plus pendant 1-3: pairs through hub 1 share one
    // neighbor each; e.g. (0,2): common=1, deg0=1, deg2=1 → 1000‰;
    // nothing may report an EDGE of the graph
    val wedge = Seq((0L, 1L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    val w = GraphOps.jaccardLinksOf(wedge).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = Set((0L, 1L), (1L, 2L), (1L, 3L))
    assert(w.nonEmpty && w.forall(p => !edges.contains(p)),
      s"adjacent pairs leaked into link prediction: ${w.toSeq}")
  }

  test("graph_hits: a complete bipartite graph is a fixed point - pure uniform hubs and authorities") {
    import spark.implicits._
    // L = {1,2} -> R = {3,4}: L vertices are pure hubs (0.5 each after L1
    // normalization), R pure authorities; the roles must not bleed
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = GraphOps.hitsOf(edges).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0.5, 0.0)) && got(2L) == ((0.5, 0.0)), s"$got")
    assert(got(3L) == ((0.0, 0.5)) && got(4L) == ((0.0, 0.5)), s"$got")
  }

  test("graph_ppr: teleport mass stays home; unreachable vertices read exactly 0") {
    import spark.implicits._
    // component {1,2} (source side) and a disconnected component {3,4}:
    // no walk from 1 reaches 3 or 4, so their PPR must be exactly 0.0 —
    // not small, ZERO (global pagerank gives every vertex (1-d) instead)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val got = GraphOps.pprOf(edges, 1L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) == 0.0 && got(4L) == 0.0, s"mass leaked off-component: $got")
    // closed form on the 2-cycle (mass alternates each hop):
    // i1 = (0.15, 0.85), i2 = (0.8725, 0.1275), i3 = (0.258375, 0.741625)
    assert(got(1L) == 0.258375 && got(2L) == 0.741625, s"$got")
  }

  test("graph_biproj: full co-audience reads cosine 1; disjoint audiences produce no edge") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = new Timestamp(1700006400000L)
    // users 1-4 do both a and b (cosine 1); type c has its own users
    val rows = (1 to 4).flatMap(u =>
      Seq((u.toLong, "a", t0), (u.toLong, "b", t0))) ++
      Seq((9L, "c", t0), (10L, "c", t0))
    val got = GraphOps.biprojOf(rows.toDF("user_id", "event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("a", "b")), s"phantom edges: ${got.keySet}")
    assert(got(("a", "b")) == ((4L, 1.0)), s"$got")
  }

  test("graph_hits: scores are L1-normalized distributions on the real graph") {
    val rows = GraphOps.hits(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 0)
    val hubSum = rows.map(_.getDouble(1)).sum
    val authSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(hubSum - 1.0) < 1e-6, s"hub mass: $hubSum")
    assert(math.abs(authSum - 1.0) < 1e-6, s"auth mass: $authSum")
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0))
  }
}
