package graft.ops
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** 10x scale probe: replicate the sf0.1 corpus 10x with distinct doc_ids
  * and run the minhash pipeline. The replication makes every cross-replica
  * pair an exact duplicate — the dup-heavy adversarial corpus (5000 docs x
  * C(10,2) = 225k cross-copy candidate pairs vs 274 at 1x) — so this is
  * the banding's stress case, not just a bigger input: the LSH join must
  * absorb a 800x candidate blowup without an all-pairs stage. Asserts
  * correctness properties only (counts), logs the timing ratio (measured:
  * 10x data -> ~2x minhash wall clock on local[32]; the cluster loop scales
  * with the edge count, ~6x at 800x edges). */
class ScaleProbeSpec extends SparkSpec {
  test("probe: dedup_minhash at 1x vs 10x documents") {
    val dir = "/root/testdata/sf0.1"
    val docs = table(spark, dir, "documents")
    val n = docs.count()
    val out = java.nio.file.Files.createTempDirectory("scale10").toString
    (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm
    DedupOps.dedupMinhash(spark, dir).count()
    val (c1, t1) = time(DedupOps.dedupMinhash(spark, dir).count())
    val (c10, t10) = time(DedupOps.dedupMinhash(spark, out).count())
    info(f"1x: $n docs, $c1 pairs, $t1%.2fs; 10x: ${n * 10} docs, $c10 pairs, $t10%.2fs, ratio ${t10 / t1}%.1fx")
    val (cc1, tc1) = time(Extended.dedupClusters(spark, dir).count())
    val (cc10, tc10) = time(Extended.dedupClusters(spark, out).count())
    info(f"clusters 1x: $cc1 rows $tc1%.2fs; 10x: $cc10 rows $tc10%.2fs, ratio ${tc10 / tc1}%.1fx")
    assert(c10 >= c1 * 10) // every replica contributes its pair set

    // inverted index under 10x: the vocab is FIXED (replicas add documents,
    // not tokens), so rows stay at vocab size while every posting list
    // grows 10x — the stopword-postings regime the invidx scaladoc warns
    // about, in miniature. The build must stay hash-aggregated (no sort of
    // the exploded token stream) and wall clock must scale with the
    // posting volume, not quadratically.
    val (v1, ti1) = time(TextOps.invIndex(spark, dir).count())
    val (v10, ti10) = time(TextOps.invIndex(spark, out).count())
    info(f"invidx 1x: $v1 tokens $ti1%.2fs; 10x: $v10 tokens $ti10%.2fs, ratio ${ti10 / ti1}%.1fx")
    assert(v10 == v1, "replication must not invent vocabulary")
  }

  test("probe: kmeans at 1x vs 10x embeddings — replication-invariant centroids") {
    // replicating every vector 10x (seeds stay replica-0's vec_id < 8)
    // multiplies each cluster's quantized element sums AND its count by
    // exactly 10, so the means — and therefore the pass-2 centroids and
    // every assignment — must be BIT-IDENTICAL to the 1x run. This is the
    // partition-order-independence argument made measurable: a bigger
    // corpus changes the work, not the geometry. Wall clock must scale
    // ~linearly (broadcast assign + K*dims-cell aggregate, no pairwise
    // stage).
    val dir = "/root/testdata/sf0.1"
    val emb = table(spark, dir, "embeddings")
    val out = java.nio.file.Files.createTempDirectory("scale10v").toString
    (0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    VectorOps.simKmeans(spark, dir).count() // warm
    val (r1, t1) = time(VectorOps.simKmeans(spark, dir).collect())
    val (r10, t10) = time(VectorOps.simKmeans(spark, out).collect())
    info(f"kmeans 1x: ${r1.length} rows $t1%.2fs; 10x: ${r10.length} rows $t10%.2fs, ratio ${t10 / t1}%.1fx")
    assert(r10.length == r1.length * 10)
    val base = r1.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    r10.foreach { r =>
      val orig = r.getLong(0) % 1000000L
      assert(base(orig) == ((r.getLong(1), r.getDouble(2))),
        s"replica of vec $orig diverged: ${base(orig)} vs (${r.getLong(1)}, ${r.getDouble(2)})")
    }
  }
}
