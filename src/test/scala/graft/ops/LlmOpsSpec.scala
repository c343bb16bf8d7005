package graft.ops

import graft.SparkSpec

/** Specs for the LLM-data-pipeline operators: multimodal decode plumbing and
  * cross-method dedup consistency on the sf0.001 corpus. */
class LlmOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("multimodal: binary payload plumbing + batched partition-local decode") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val decoded = Multimodal.decodeAll(media, batchSize = 7).collect()
    assert(decoded.length == media.count())
    // deterministic: same payload -> same features
    val again = Multimodal.decodeAll(Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(decoded.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
    // features derive from payload bytes, dims in range
    assert(decoded.forall(d => d.width >= 1 && d.width <= 640))
    assert(decoded.forall(d => d.n_bytes > 0))
    // video kind gets frames, others exactly 1
    assert(decoded.filter(_.kind != "video").forall(_.n_frames == 1))
  }

  test("dedup methods agree on high-similarity pairs") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacDf = DedupOps.dedupNgramJaccard(spark, dir)
    val jacHigh = pairs(jacDf.filter(org.apache.spark.sql.functions.col("jaccard") >= 0.9))
    val mh = pairs(DedupOps.dedupMinhash(spark, dir))
    val sh = pairs(DedupOps.dedupSimhash(spark, dir))
    assert(jacHigh.nonEmpty)           // the corpus has planted near-dups
    // MinHash 4x2 bands: per-pair hit rate 1-(1-J^2)^4 ≈ 99.98% at J=0.9.
    assert(jacHigh.subsetOf(mh))
    // SimHash is noisier on short docs (few shingles -> high-variance bits):
    // observed hamming 0-5 on J~0.97 pairs, so hamming<=3 recovers most but
    // not all — assert majority recall, which is the method's contract.
    val recall = jacHigh.count(sh.contains).toDouble / jacHigh.size
    assert(recall >= 0.6, s"simhash recall $recall")
  }

  test("vector ops: top-k is self-consistent and bounded") {
    val topk = VectorOps.simTopk(spark, dir).collect()
    assert(topk.nonEmpty)
    val byQuery = topk.groupBy(_.getLong(0))
    assert(byQuery.forall(_._2.length <= 10))
    byQuery.values.foreach { rows =>
      val scores = rows.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)  // descending by rank
    }
  }

  test("sim_ann_topk: LSH-banded ANN recalls >= 0.9 of the exact top-10") {
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(VectorOps.simTopk(spark, dir))
    val ann = hits(VectorOps.simAnnTopk(spark, dir))
    assert(exact.nonEmpty)
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall vs exact top-10")
  }

  test("dedup_clusters: components are consistent with the verified pairs") {
    import org.apache.spark.sql.functions.col
    val pairs = Extended.dedupVerifyEditdist(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Extended.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // every verified pair lands in one cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster_id is the member minimum; exactly that member is kept
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.collect { case (id, (_, true)) => id }.toSeq == Seq(cid))
    }
    // docs in no pair keep themselves
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot(c => paired(c._1)).foreach { case (id, (cid, keep)) =>
      assert(cid == id && keep)
    }
  }

  test("approx_distinct stays in its exact regime (no HLL register collisions)") {
    // agg_approx_distinct's oracle is an EXACT count(DISTINCT): valid only
    // while every per-group cardinality is small enough that HLL++ linear
    // counting is collision-free. Assert approx == exact on the corpus the
    // driver checks, so a corpus change surfaces here, not as a silent
    // oracle mismatch.
    import org.apache.spark.sql.functions.{approx_count_distinct, col, count_distinct}
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val bad = table(spark, d, "events")
        .groupBy("user_id")
        .agg(approx_count_distinct(col("event_type")).as("a"),
          count_distinct(col("event_type")).as("e"))
        .filter(col("a") =!= col("e")).count()
      assert(bad == 0, s"HLL register collision in $d breaks the exact oracle")
    }
  }

  test("documents corpus is ASCII — the polyhash byte/char fold equivalence holds") {
    // PolyHash folds UTF-8 bytes; the DuckDB oracles fold per-character
    // codepoints. They agree exactly when every document is ASCII, which
    // every dedup_* and mm_decode oracle depends on. Checked at all three
    // scale factors the driver uses.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { d =>
        val nonAscii = table(spark, d, "documents")
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        assert(nonAscii == 0, s"non-ASCII documents in $d would desync the oracles")
      }
  }
}
