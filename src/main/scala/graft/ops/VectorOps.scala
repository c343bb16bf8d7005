package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity operators over the `embeddings` table (64-dim unit
  * float vectors): brute-force cosine top-k (the correctness baseline),
  * label-blocked pair search (the IVF-style scale path: a coarse partitioner
  * bounds the candidate set), and random-hyperplane LSH bucketing (the other
  * scale path: sign-bit signatures turn ANN into an equality join).
  *
  * Dot products are sequential left-to-right folds in double precision so
  * the DuckDB oracle (list_reduce) reproduces them bit-for-bit; vectors are
  * unit-norm so cosine == dot.
  */
object VectorOps {

  /** Embedding dimensionality of the corpus. */
  val dims = 64

  /** dot(a, b) in double precision — the codegen'd
    * [[graft.functions.DotProduct]] expression: a fused multiply-add loop
    * over the ArrayData buffers inside whole-stage codegen. Supersedes two
    * slower formulations, both measured on the sf0.1 pair search: an
    * unrolled 64-term element_at sum (5.0s — per-term null/bounds checks)
    * and the interpreted `aggregate(zip_with(...))` fold (2.0s — closure
    * dispatch and boxing per element, outside codegen). Left-to-right
    * accumulation keeps the result bit-identical to the oracle's
    * sequential list_reduce. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  private val duckDot = // same ordered fold, DuckDB lambdas
    """list_reduce(list_concat([0.0], list_transform(range(1, 65),
        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (acc, x) -> acc + x)"""

  /** EMBEDDING-TABLE QUALITY AUDIT — the pre-flight a vector pipeline
    * runs before building any index over 100 TB of embeddings: per
    * label stratum, vector count, degenerate-vector counts (zero norm;
    * non-finite components — the NaN that silently poisons every cosine
    * downstream), and the squared-norm envelope. One pass, one keyed
    * aggregate; norms are the same ordered [[dot]] fold the retrieval
    * ops use, rounded to the 1e-5 grid BEFORE aggregation so min/max/sum
    * land identically in both engines (sums ride exact DECIMAL). */
  def dqVec(spark: SparkSession, dir: String): DataFrame = {
    val n2 = roundD(dot(col("embedding"), col("embedding")), 5)
    table(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        n2.as("n2"),
        exists(col("embedding"), v => isnan(v) || v === Float.PositiveInfinity
          || v === Float.NegativeInfinity).as("bad"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("n2") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"),
        min("n2").as("min_norm2"), max("n2").as("max_norm2"),
        sum(col("n2").cast(DecimalType(18, 5))).cast(DoubleType)
          .as("sum_norm2"))
      .orderBy("label")
  }

  /** Power-iteration rounds for the Gram-space spectral audits
    * ([[vecPca]], [[vecDrift]]). */
  val pcaIters = 3

  /** One-pass quantized Gram accumulator: n, per-dim component sums
    * S1[dims], and the upper-triangle raw Gram Q[dims·(dims+1)/2] over
    * q = ⌊x·10⁶⌉ integer components — the
    * RowMatrix.computeGramianMatrix shape: a fixed dim²-size per-partition
    * fold merged associatively, no shuffle, no data-scale collect. */
  private[graft] final class GramAcc extends Serializable {
    var n = 0L
    val s1 = Array.ofDim[Long](dims)
    val q = Array.ofDim[Long](dims * (dims + 1) / 2)
    def add(e: Array[Float]): Unit = {
      val d = dims
      val qv = Array.tabulate(d)(i =>
        math.floor(e(i).toDouble * 1e6 + 0.5).toLong)
      n += 1L
      var i = 0
      var k = 0
      while (i < d) {
        s1(i) += qv(i)
        var j = i
        while (j < d) { q(k) += qv(i) * qv(j); k += 1; j += 1 }
        i += 1
      }
    }
    def merge(b: GramAcc): GramAcc = {
      n += b.n
      var i = 0
      while (i < dims) { s1(i) += b.s1(i); i += 1 }
      i = 0
      while (i < q.length) { q(i) += b.q(i); i += 1 }
      this
    }
  }

  /** Exact centered scatter C = n·Q − S1·S1ᵀ (BigInt — no overflow at any
    * corpus size) from a [[GramAcc]], then [[pcaIters]] rounds of the
    * quantized power iteration (v₀ = 1/8 everywhere; each contribution
    * ⌊C_ij·v_j/2⁴⁰⌉ is an exact integer before its sum, so iteration and
    * aggregation order cannot matter — the DuckDB twins replay the
    * identical pipeline over HUGEINT sums). Returns the 6-dp λ₁ share
    * (None when the scatter is zero or an iterate vanishes) and the
    * 1-based dominant axis (|v| argmax, ties to the lowest axis;
    * degenerate strata report axis 1, matching the oracle's NULLS-LAST
    * ordering). */
  private[graft] def gramPower(a: GramAcc): (Option[Double], Int) = {
    val d = dims
    def triIdx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    val c = Array.ofDim[BigInt](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = BigInt(a.n) * BigInt(a.q(triIdx(i, j))) -
          BigInt(a.s1(i)) * BigInt(a.s1(j))
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val trace = (0 until d).foldLeft(BigInt(0))((acc, k) => acc + c(k)(k))
    if (trace <= 0) return (None, 1)
    var v = Array.fill(d)(0.125)
    var w = Array.ofDim[Long](d)
    var last = 0.0
    var dead = false
    for (_ <- 1 to pcaIters if !dead) {
      w = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) {
          s += math.floor(c(i)(j).toDouble * v(j) / driftScale + 0.5).toLong
          j += 1
        }
        s
      }
      val ss = w.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * BigInt(x))
      val nrm = math.sqrt(ss.toDouble)
      if (nrm == 0.0) dead = true
      else { last = nrm; v = w.map(_.toDouble / nrm) }
    }
    if (dead) (None, 1)
    else {
      def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      val topDim = v.map(math.abs).zipWithIndex
        .sortBy { case (av, i) => (-av, i) }.head._2 + 1
      (Some(round6(last * driftScale / trace.toDouble)), topDim)
    }
  }

  /** DOMINANT-DIRECTION AUDIT (truncated power iteration) — the
    * anisotropy readout on the embedding table beside [[dqVec]]'s
    * per-vector hygiene: λ₁'s share of total variance and the dominant
    * axis. A collapsed embedding space (every vector pointing the same
    * way — the classic representation-degeneration failure) shows up
    * here as lambda1_share → 1 long before retrieval metrics crater;
    * isotropic spaces sit near 1/64.
    *
    * Exactness across engines WITHOUT trusting float sums: components
    * quantize to q = ⌊e·10⁶⌉ once, the one-pass [[GramAcc]] carries only
    * exact integer sums, centering is the cross-multiplied scatter
    * C = n·Q − S1·S1ᵀ (no division, BigInt), and every power-iteration
    * contribution is an integer before its sum ([[gramPower]]); only
    * norms/divisions/sqrt are double — identical IEEE trees in the
    * DuckDB twin, which replays the identical unrolled iteration over
    * HUGEINT sums.
    *
    * Scale shape (supersedes the round-12 form, which re-scanned the
    * corpus once per iteration plus twice for moments): ONE pass over
    * the table folds a fixed dim²-size accumulator per partition and
    * merges associatively — the RowMatrix.computeGramianMatrix shape —
    * then all matrix math happens on metadata-scale integers. At 100 TB
    * that is 1 scan instead of [[pcaIters]]+2, and the driver sees 2 145
    * integers regardless of corpus size. */
  def vecPca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = table(spark, dir, "embeddings")
      .select(col("embedding")).as[Array[Float]]
    val acc = rows.rdd.treeAggregate(new GramAcc)(
      (a, e) => { a.add(e); a }, (a, b) => a.merge(b))
    val (share, topDim) = gramPower(acc)
    spark.range(1).select(
      lit(acc.n).as("n_vectors"), lit(64).as("dim"),
      share.map(lit(_)).getOrElse(lit(null).cast(DoubleType))
        .as("lambda1_share"),
      lit(topDim).as("top_dim"))
  }

  /** Contribution down-scale for [[vecDrift]]'s Gram-space power
    * iteration: 2⁴⁰, an exact power of two (lossless double division),
    * sized so each quantized C·v term stays far inside int64 at any
    * realistic per-stratum count (envelope: |C| ≤ n²·10¹², so a term is
    * ≤ n²·10¹²/2⁴⁰ ≈ n²·909 — int64-safe to n ≈ 10⁸ vectors per
    * (label, version) stratum; the C entries themselves ride BigInt /
    * HUGEINT, unbounded). */
  private[graft] val driftScale = 1099511627776.0 // 2^40

  /** EMBEDDING-DRIFT AUDIT — the TEMPORAL member of the vec family: did
    * the embedding pipeline move between two corpus versions? Per label
    * stratum, comparing the OLD snapshot (vec_id % 2 = 0) against the NEW
    * one (% 2 = 1 — the deterministic version lane, the `graph_cc_incr`
    * split convention; production compares yesterday's table against
    * today's):
    *   - `centroid_shift` — ‖μ_old − μ_new‖, THE regression alarm: a
    *     retrained encoder or a units/normalization bug moves whole
    *     strata before any retrieval metric craters;
    *   - `lambda1_share_old/new/delta` — [[vecPca]]'s anisotropy readout
    *     per stratum and version: a collapsing space (share → 1) caught
    *     as a DELTA between versions, not a global average.
    *
    * Exactness across engines without trusting float sums: components
    * quantize to q = ⌊x·10⁶⌉ once ([[vecPca]]'s grid), and everything
    * downstream is integer — per-stratum moment sums S1, the quantized
    * Gram Q_ij = Σ q_i·q_j, the exact centered scatter C_ij = n·Q_ij −
    * S1_i·S1_j (cross-multiplication, no division), centroid-shift
    * numerators S1old·n_new − S1new·n_old, and each power-iteration
    * contribution ⌊C_ij·v_j/2⁴⁰⌉ (summed exactly, so iteration order
    * cannot matter). Only norms/divisions/sqrt are double — identical
    * IEEE trees both engines. The DuckDB twin replays the identical
    * 3-round iteration unrolled over the same HUGEINT sums.
    *
    * Scale shape: ONE pass over the table builds the per-stratum
    * (n, S1[64], upper-tri Q[2080]) accumulators via treeAggregate —
    * the [[https://spark.apache.org/docs/latest/mllib-dimensionality-reduction.html
    * RowMatrix.computeGramianMatrix]] shape: a fixed dim²-size
    * accumulator folded per partition and merged associatively (the one
    * genuinely-imperative-per-partition case the RDD layer exists for;
    * no shuffle, no data-scale collect — the driver sees
    * |labels|·2·2080 integers regardless of corpus size), then all
    * matrix math happens on metadata-scale exact integers. */
  def vecDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = dims
    val rows = table(spark, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2).cast(IntegerType).as("ver"),
        col("embedding"))
      .as[(Int, Int, Array[Float])]
    type M = scala.collection.mutable.HashMap[(Int, Int), GramAcc]
    val zero: M = scala.collection.mutable.HashMap.empty
    val sums = rows.rdd.treeAggregate(zero)(
      (m, r) => { m.getOrElseUpdate((r._1, r._2), new GramAcc).add(r._3); m },
      (m1, m2) => {
        m2.foreach { case (k, b) =>
          m1.getOrElseUpdate(k, new GramAcc).merge(b): Unit
        }
        m1
      })
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val out = sums.keys.map(_._1).toSeq.distinct.sorted.flatMap { label =>
      (sums.get((label, 0)), sums.get((label, 1))) match {
        case (Some(o), Some(nw)) =>
          val sumsq = (0 until d).foldLeft(BigInt(0)) { (acc, k) =>
            val num = BigInt(o.s1(k)) * BigInt(nw.n) -
              BigInt(nw.s1(k)) * BigInt(o.n)
            acc + num * num
          }
          val shift =
            round6(math.sqrt(sumsq.toDouble) / ((o.n * nw.n).toDouble * 1e6))
          val (so, sn) = (gramPower(o)._1, gramPower(nw)._1)
          val delta = for (x <- so; y <- sn) yield round6(y - x)
          Some((label, o.n, nw.n, shift, so, sn, delta))
        case _ => None // stratum absent from one version: nothing to diff
      }
    }
    out.toDF("label", "n_old", "n_new", "centroid_shift",
      "lambda1_share_old", "lambda1_share_new", "lambda1_share_delta")
      .orderBy("label")
  }

  /** Brute-force cosine top-10 per query vector (queries = vec_id < 5,
    * broadcast to every partition): the exact baseline every ANN variant is
    * judged against. Scales as one pass over the corpus per query batch. */
  def simTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 10)
      .orderBy("query_id", "rk")
  }

  /** Label-blocked near-dup pairs: cosine ≥ 0.3 within the same label — the
    * IVF pattern (coarse quantizer → search only the bucket). The join is
    * keyed on label, so candidates shuffle once by block. */
  def simPairsCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    emb.as("x").join(emb.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      // pinned: the filter would otherwise inline the 64-term dot a second
      // time into the join condition (see graft.ops.pinned)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.label").as("label"),
        pinned(roundD(dot(col("x.embedding"), col("y.embedding")), 5)).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .orderBy("a", "b")
  }

  /** Deterministic pseudo-random hyperplane weights: w(i,j) for dim i,
    * plane j — an LCG step, same constants in the oracle. */
  private def weight(i: Int, j: Int): Long =
    ((1103515245L * (i * 8 + j) + 12345L) % 2001L) - 1000L

  /** nBits-wide random-hyperplane signature of the embedding column. */
  private def bucketCol(nBits: Int = 8): Column =
    (0 until nBits).map { j =>
      val w = array((0 until 64).map(i => lit(weight(i, j).toDouble)): _*)
      when(dot(col("embedding"), w) > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** Random-hyperplane LSH: 8 sign bits → bucket id; histogram of bucket
    * occupancy. Buckets turn ANN candidate generation into a groupBy/join on
    * an 8-bit key — the shuffle is on bucket ids, never vectors×vectors. */
  def simAnnLsh(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(bucketCol().as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** End-to-end ANN retrieval: hyperplane-LSH candidate generation →
    * within-candidate cosine verify → top-10 per query. The sign bits are
    * banded `bands`×`bitsPerBand` (minhash-style): a corpus vector is a
    * candidate when ANY band of its signature matches the query's — each
    * band is an equality join key, so candidate generation is a keyed join
    * against the broadcast query side, never all-pairs. Multi-band hits are
    * deduped AFTER scoring with a (query, vec) max-aggregate: re-computing
    * a ≤bands× redundant dot is cheaper at scale than shuffling embeddings
    * through a distinct.
    *
    * `(bands, bitsPerBand)` is the probe-depth knob a 100 TB deployment
    * tunes: more/narrower bands → a candidate needs to agree on fewer bits
    * to be probed (higher recall, more candidates verified); fewer/wider
    * bands → tighter buckets (cheaper, lower recall). Probe probability for
    * a pair agreeing on each bit w.p. p is 1-(1-p^bitsPerBand)^bands. The
    * default 4×2 holds recall ≥ 0.9 vs the exact `sim_topk` at both
    * sf0.001 and sf0.1 (asserted in LlmOpsSpec, with the monotone
    * recall-vs-depth ordering). */
  def simAnnTopk(spark: SparkSession, dir: String,
      bands: Int = 4, bitsPerBand: Int = 2): DataFrame = {
    val nBits = bands * bitsPerBand
    require(nBits > 0 && nBits < 63, s"need 0 < bands*bitsPerBand < 63, got $nBits")
    val mask = (1L << bitsPerBand) - 1L
    // NOT checkpointed, deliberately (cf. the text dedups, which are): the
    // corpus and query branches do plan this subtree twice, but the frame
    // carries the raw embedding column (the verify stage needs it), so
    // materializing it would spill the entire vector table to executor
    // storage — at 100 TB, two pruned columnar scans + two cheap hyperplane
    // passes beat writing and re-reading the vectors once (measured here
    // too: the checkpointed variant benches slower).
    val sig = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), pinned(bucketCol(nBits)).as("bucket"))
    def banded(df: DataFrame, b: String, s: String): DataFrame =
      df.select(col("*"), explode(array((0 until bands).map(bi =>
        struct(lit(bi).as(b),
          shiftright(col("bucket"), bi * bitsPerBand).bitwiseAND(mask).as(s))): _*)).as("bnd"))
        .select(df.columns.map(col) :+ col(s"bnd.$b").as(b) :+ col(s"bnd.$s").as(s): _*)
    val corpus = banded(sig, "band", "sig")
    val queries = banded(
      sig.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket")),
      "qband", "qsig")
    corpus.join(broadcast(queries),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("cosine"))
      .groupBy("query_id", "vec_id")
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast(LongType))
      .filter(col("rk") <= 10)
      .orderBy("query_id", "rk")
  }

  /** ANN RECALL AUDIT — the completeness critic of the vec family: per
    * query, how much of the EXACT brute-force top-10 ([[simTopk]]) does
    * the LSH path ([[simAnnTopk]]) actually return? Recall@k is the one
    * number an ANN index is allowed to trade for speed, and a deploy that
    * doesn't measure it is guessing — band/bit tuning, embedding drift
    * ([[vecDrift]]) and skewed buckets all show up here first. Both sides
    * are the already-oracle-checked queries composed (their shared SQL
    * texts compose the same way in the DuckDB twin); the audit itself is
    * three keyed counts over ≤ |queries|·k rows. At 100 TB the exact side
    * is the expensive one — which is exactly why production runs THIS
    * audit on a query SAMPLE while serving from the ANN path. */
  def simRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = simTopk(spark, dir).select("query_id", "vec_id")
    val ann = simAnnTopk(spark, dir).select("query_id", "vec_id")
    val ex = exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
    val an = ann.groupBy("query_id").agg(count(lit(1)).as("n_ann"))
    val ht = exact.join(ann, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    ex.join(an, Seq("query_id"), "left")
      .join(ht, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_ann"), lit(0L)).as("n_ann"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("coalesce(n_hit, 0) * 1000 div n_exact").as("recall_pm"))
      .orderBy("query_id")
  }

  /** HYBRID RETRIEVAL via RECIPROCAL-RANK FUSION — the production search
    * stack's standard two-leg merge (RRF, Cormack et al.: score(d) =
    * Σ 1/(60+rank_leg(d))): the LEXICAL leg is the oracle-checked `bm25`
    * top-20 ([[graft.ops.TextOps.bm25]]), the SEMANTIC leg the exact
    * cosine top-10 for query vector 3 ([[simTopk]]) — the `documents` and
    * `embeddings` tables share the id space, so doc i's text and
    * embedding are the same item's two representations. RRF needs only
    * RANKS, never comparable scores, which is exactly why it is the
    * fusion of choice when the legs' score scales are incommensurable
    * (BM25 micros vs cosine).
    *
    * Exactness: ranks are integers, each reciprocal is one integer
    * division on the 1e9 grid (floor(1e9/(60+r)) — both engines' `div`),
    * the fused score an exact BIGINT sum; a doc missing from a leg
    * contributes 0 (the standard union-of-lists convention). Both legs
    * are the already-proven queries COMPOSED (the [[simRecall]] shared-
    * text discipline), the fusion itself a full-outer join + TakeOrdered
    * over ≤ 30 rows — metadata scale regardless of corpus size. */
  def simRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    // rank over the ≤20-row bm25 result: the single-partition window is
    // bounded by the retrieval's own LIMIT, never by the corpus
    val lex = graft.ops.TextOps.bm25(spark, dir)
      .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id")))
        .cast(LongType).as("rank_lex"))
    val vec = simTopk(spark, dir).filter(col("query_id") === 3)
      .select(col("vec_id").as("doc_id"), col("rk").as("rank_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        (coalesce(expr("1000000000 div (60 + rank_lex)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + rank_vec)"), lit(0L)))
          .as("rrf_x1e9"))
      .orderBy(col("rrf_x1e9").desc, col("doc_id"))
      .limit(10)
  }

  /** FILTERED ANN — [[simAnnTopk]] under a metadata predicate (each query
    * retrieves only candidates sharing its `label`): the production
    * retrieval shape ("similar items IN THIS CATEGORY") where the naive
    * plan post-filters verified candidates and wastes the verify work on
    * rows the predicate will drop. Here the constraint joins the LSH
    * band key — the candidate join is keyed on (band, sig, LABEL), so
    * selectivities multiply at candidate-generation time and a filtered-
    * out vector is never dotted. At 100 TB with a selective predicate
    * this is the difference between ANN-then-filter (recall collapses:
    * the top-k fills with dropped rows) and filter-aware routing. */
  def simAnnFiltered(spark: SparkSession, dir: String,
      bands: Int = 4, bitsPerBand: Int = 2): DataFrame = {
    val nBits = bands * bitsPerBand
    val mask = (1L << bitsPerBand) - 1L
    val sig = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"),
        pinned(bucketCol(nBits)).as("bucket"))
    def banded(df: DataFrame, b: String, s: String): DataFrame =
      df.select(col("*"), explode(array((0 until bands).map(bi =>
        struct(lit(bi).as(b),
          shiftright(col("bucket"), bi * bitsPerBand).bitwiseAND(mask).as(s))): _*)).as("bnd"))
        .select(df.columns.map(col) :+ col(s"bnd.$b").as(b) :+ col(s"bnd.$s").as(s): _*)
    val corpus = banded(sig, "band", "sig")
    val queries = banded(
      sig.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"), col("bucket")),
      "qband", "qsig")
    corpus.join(broadcast(queries),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("label") === col("qlabel") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("label"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("cosine"))
      .groupBy("query_id", "label", "vec_id")
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast(LongType))
      .filter(col("rk") <= 10)
      .orderBy("query_id", "rk")
  }

  /** MATRYOSHKA PREFIX RETRIEVAL — the truncated-dimension serving trick
    * (MRL-style nested embeddings): score candidates with only the FIRST
    * 16 of 64 dimensions (¼ the FLOPs and memory bandwidth — the prefix
    * can live in fast storage while full vectors stay cold), keep a
    * 30-deep shortlist per query, then RERANK the shortlist with the full
    * 64-dim dot. At 100 TB the prefix pass is the only corpus-wide scan;
    * the exact re-score touches 30 vectors per query. `hit_full` marks
    * whether each reranked result is in the exact full-dim top-10 — the
    * recall audit shipped as a column, so the oracle hash certifies the
    * measured quality, not just the pipeline. All scores round 5 dp with
    * vec_id tie-breaks (deterministic in both engines). */
  def simPrefix(spark: SparkSession, dir: String,
      prefixDims: Int = 16, shortlist: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = table(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("embedding"),
        roundD(dot(slice(col("qv"), 1, prefixDims),
          slice(col("embedding"), 1, prefixDims)), 5).as("pdot"))
    val wP = Window.partitionBy("query_id")
      .orderBy(col("pdot").desc, col("vec_id"))
    val short = scored
      .withColumn("prk", row_number().over(wP))
      .filter(col("prk") <= shortlist)
    val wF = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    val reranked = short
      .select(col("query_id"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("cosine"))
      .withColumn("rk", row_number().over(wF).cast(LongType))
      .filter(col("rk") <= 10)
    // exact full-dim top-10 for the recall flag
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("c"))
      .withColumn("xrk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("c").desc, col("vec_id"))))
      .filter(col("xrk") <= 10)
      .select(col("query_id"), col("vec_id"), lit(true).as("hit_full"))
    reranked.join(exact, Seq("query_id", "vec_id"), "left")
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rk"),
        coalesce(col("hit_full"), lit(false)).as("hit_full"))
      .orderBy("query_id", "rk")
  }

  /** Magnitude cap for [[simMips]] — item magnitudes are 1 + vec_id % 5,
    * so M = 5 bounds them by construction (at 100 TB the cap comes from
    * a one-pass max over the magnitude column instead). */
  private val mipsM = 5.0

  private def mipsMag: Column = (col("vec_id") % 5 + lit(1)).cast(DoubleType)

  /** Hyperplane signature of the AUGMENTED item vector [mag·e ;
    * sqrt(M² − mag²)] — 65th-dim weight follows the same LCG. */
  private def mipsBucketCol(nBits: Int): Column =
    (0 until nBits).map { j =>
      val w = array((0 until 64).map(i => lit(weight(i, j).toDouble)): _*)
      val proj = col("mag") * dot(col("embedding"), w) +
        sqrt(lit(mipsM * mipsM) - col("mag") * col("mag")) *
          lit(weight(64, j).toDouble)
      when(proj > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** MAXIMUM INNER PRODUCT search (MIPS) — the recommender/rerank shape:
    * items carry a POPULARITY MAGNITUDE (here 1 + vec_id % 5 on the unit
    * embedding), queries want argmax q·x, and cosine machinery does NOT
    * apply directly because inner product is not a metric (a vector can
    * out-score a more-aligned one by sheer norm). The classic reduction
    * (Bachrach et al. '14 / Shrivastava–Li '14 asymmetric transform)
    * restores it: append sqrt(M² − ‖x‖²) to every item (M = max norm) and
    * 0 to every query — all items then share norm M, so augmented-cosine
    * order IS inner-product order, and the EXISTING hyperplane-LSH band
    * join does the candidate generation unchanged. Final scoring is the
    * exact inner product (the augmentation only routes), re-ranked top-10
    * per query with multi-band hits deduped by max — the sim_ann_topk
    * plan shape with one extra signature dimension. LlmOpsSpec asserts
    * recall vs the brute-force MIPS baseline and that magnitude really
    * reorders results vs plain cosine. */
  def simMips(spark: SparkSession, dir: String,
      bands: Int = 4, bitsPerBand: Int = 2): DataFrame = {
    val nBits = bands * bitsPerBand
    val mask = (1L << bitsPerBand) - 1L
    val emb = table(spark, dir, "embeddings")
    val sig = emb
      .select(col("vec_id"), col("embedding"), mipsMag.as("mag"))
      .select(col("vec_id"), col("embedding"), col("mag"),
        pinned(mipsBucketCol(nBits)).as("bucket"))
    // queries augment with 0 (and unit magnitude): their signature is the
    // plain hyperplane signature of the unit embedding
    val qsig = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        pinned(bucketCol(nBits)).as("bucket"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket"))
    def banded(df: DataFrame, b: String, sc: String): DataFrame =
      df.select(col("*"), explode(array((0 until bands).map(bi =>
        struct(lit(bi).as(b),
          shiftright(col("bucket"), bi * bitsPerBand).bitwiseAND(mask)
            .as(sc))): _*)).as("bnd"))
        .select(df.columns.map(col) :+ col(s"bnd.$b").as(b) :+
          col(s"bnd.$sc").as(sc): _*)
    banded(sig, "band", "sig")
      .join(broadcast(banded(qsig, "qband", "qsig")),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        roundD(col("mag") * dot(col("qv"), col("embedding")), 5).as("ip"))
      .groupBy("query_id", "vec_id")
      .agg(max(col("ip")).as("ip"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("ip").desc, col("vec_id"))).cast(LongType))
      .filter(col("rk") <= 10)
      .orderBy("query_id", "rk")
  }

  /** Embedding-cosine near-duplicate dedup — the vector-space member of the
    * dedup family (exact / Jaccard / MinHash / SimHash live in
    * [[DedupOps]]): near-dup candidate pairs come from banded hyperplane-LSH
    * signatures (same `bands`×`bitsPerBand` knob as [[simAnnTopk]]), are
    * verified with exact cosine ≥ `threshold` inside the bucket join, and
    * collapse to a keep-list — every vector annotated with the smallest
    * vec_id it duplicates (`dup_of`, null when unique) and `keep` =
    * first-in-cluster.
    *
    * Scale shape (100 TB): candidate generation is an equality join keyed on
    * (band, sig) — never all-pairs; the cosine predicate runs INSIDE the
    * join so only surviving pairs are materialized (the dedup_simhash
    * lesson); the min-aggregate ships only (a, b) id pairs; the final
    * keep-list join is AQE-sized (dup lists are small relative to the
    * corpus, but unbounded on adversarial input — no static broadcast).
    * The synthetic corpus has no planted high-cosine twins (max pairwise
    * cosine ≈ 0.51), so `threshold` defaults to 0.4 — "same neighborhood"
    * in this space; a production near-dup pass would run 0.9+ with wider
    * bands. */
  def dedupEmbedding(spark: SparkSession, dir: String,
      threshold: Double = 0.4, bands: Int = 4, bitsPerBand: Int = 2): DataFrame = {
    val nBits = bands * bitsPerBand
    val mask = (1L << bitsPerBand) - 1L
    val emb = table(spark, dir, "embeddings")
    // not checkpointed — same raw-vector-column rationale as [[simAnnTopk]]
    val sig = emb.select(col("vec_id"), col("embedding"),
      pinned(bucketCol(nBits)).as("bucket"))
    val bandRows = sig.select(col("vec_id"), col("embedding"),
      explode(array((0 until bands).map(bi =>
        struct(lit(bi).as("band"),
          shiftright(col("bucket"), bi * bitsPerBand).bitwiseAND(mask).as("sig"))): _*)).as("bnd"))
      .select(col("vec_id"), col("embedding"),
        col("bnd.band").as("band"), col("bnd.sig").as("sig"))
    // multi-band hits repeat (a, b) rows; the min-aggregate absorbs them, so
    // no distinct — a shuffle saved (cf. simAnnTopk's max-dedupe rationale)
    val pairs = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id") &&
          roundD(dot(col("x.embedding"), col("y.embedding")), 5) >= threshold)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
    val dups = pairs.groupBy(col("b").as("vec_id")).agg(min(col("a")).as("dup_of"))
    emb.select("vec_id").join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of"), col("dup_of").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** IVF-style ANN top-k with a probe-count knob — the OTHER scale path
    * next to hyperplane banding ([[simAnnTopk]]): a coarse quantizer
    * assigns every vector to a cell (here the existing `label` column),
    * each query is scored against one representative per cell, and only
    * the top-`nprobe` cells are searched exactly. At 100 TB with the
    * corpus partitioned/bucketed by cell id, the probe join IS partition
    * pruning — `nprobe/cells` of the data is read, the rest never leaves
    * storage.
    *
    * The cell representative is the minimum-vec_id member (a deterministic
    * medoid stand-in): a production IVF trains k-means centroids, but
    * float averaging is partition-order dependent (and engine dependent),
    * which would break the bit-exact oracle — the probe/prune structure
    * under test is identical. Note the synthetic corpus assigns labels
    * independently of cosine geometry, so small-nprobe recall is low HERE
    * (measured 0.06@1, 0.28@3, and exactly 1.0 at nprobe=cells, asserted
    * in LlmOpsSpec); with a trained quantizer, cells align with cosine
    * neighborhoods and the same plan recalls high at small nprobe. */
  def simIvfTopk(spark: SparkSession, dir: String,
      nprobe: Int = 3, k: Int = 10): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    // min_by fetches the representative's embedding in the same aggregate —
    // one pruned scan instead of a min-id aggregate plus a fetch join
    // (vec_id is unique, so the arg-min is deterministic)
    val reps = emb.groupBy(col("label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("rep_emb"))
      .select(col("label").as("plabel"), col("rep_emb"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // one row per (query, cell): score against the representative, keep the
    // top-nprobe cells. Tiny frame (queries x cells) — broadcast throughout.
    val probes = queries.crossJoin(broadcast(reps))
      .select(col("query_id"), col("qv"), col("plabel"),
        roundD(dot(col("qv"), col("rep_emb")), 5).as("rep_cos"))
      .withColumn("probe_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("rep_cos").desc, col("plabel"))))
      .filter(col("probe_rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("plabel"))
    // exact search restricted to probed cells: the broadcast equality join
    // on the cell id is the partition-pruning analog
    emb.join(broadcast(probes),
        col("label") === col("plabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        roundD(dot(col("qv"), col("embedding")), 5).as("cosine"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast(LongType))
      .filter(col("rk") <= k)
      .orderBy("query_id", "rk")
  }

  /** Int8 vector quantization audit — the storage move that makes 100 TB of
    * embeddings tractable: per-vector max-abs scaling to [-127, 127]
    * integers cuts the ANN working set 4x (float32 → int8) at a bounded,
    * measured reconstruction error. Emits per-vector audit scalars (scale,
    * quantized checksum, max absolute error ≤ scale/2) rather than the int8
    * array itself, so the oracle compare stays scalar-typed.
    *
    * Shape: strictly map-side (no shuffle before the output sort). The
    * lambda chain here is interpreted, not codegen'd — fine for an audit
    * query; the hot-path serving form would be a fused native expression
    * like [[graft.functions.DotProduct]]. `pinned` keeps the scale from
    * being re-inlined per element by CollapseProject (one aggregate fold,
    * not 64). */
  def vecQuantize(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding")
    val maxAbs = aggregate(transform(v, x => abs(x.cast(DoubleType))),
      lit(0.0), (a, x) => greatest(a, x))
    table(spark, dir, "embeddings")
      .select(col("vec_id"), v.as("v"), pinned(maxAbs / 127.0).as("s"))
      .select(col("vec_id"), col("v"), col("s"),
        pinned(transform(col("v"),
          x => floor(x.cast(DoubleType) / col("s") + 0.5).cast(LongType))).as("qv"))
      .select(
        col("vec_id"),
        lit(dims.toLong).as("n_dims"),
        roundD(col("s"), 6).as("scale"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
        roundD(aggregate(
          zip_with(col("qv"), col("v"),
            (q, x) => abs(q.cast(DoubleType) * col("s") - x.cast(DoubleType))),
          lit(0.0), (a, x) => greatest(a, x)), 6).as("max_err"))
      .orderBy("vec_id")
  }

  /** Output dimensionality of the random projection. */
  val rpOutDims = 8

  /** Deterministic ±1 entry of the projection matrix for (in-dim i,
    * out-dim j). Plan-time Scala, so the SAME values land as literals in
    * both the Spark expression tree and the generated DuckDB oracle — the
    * two engines cannot disagree about the matrix. A production pipeline
    * would derive signs from a seeded hash (same shape, conf-able seed). */
  private def rpSign(i: Int, j: Int): Double =
    if (((i * 1103515245 + j * 12345) % 97) % 2 == 0) 1.0 else -1.0

  /** Random projection (Johnson-Lindenstrauss, Achlioptas ±1 form): reduce
    * the 64-dim embeddings to [[rpOutDims]] dims as y_j = (1/√k)·Σ_i
    * s_ij·x_i — the dimensionality-reduction step a 100 TB pipeline runs
    * before storing/serving ANN candidates (8x less vector IO per probe at
    * a distance-distortion cost the JL lemma bounds).
    *
    * Scale shape: strictly map-side — the matrix is k·d literals folded
    * into the plan (a broadcast at real scale), each output dim one fused
    * codegen'd [[graft.functions.DotProduct]] pass; no shuffle before the
    * presentation sort. Output dims are scalar columns so the oracle
    * compare stays scalar-typed (the [[vecQuantize]] rationale). */
  def vecRandomProjection(spark: SparkSession, dir: String): DataFrame = {
    val invSqrtK = 1.0 / math.sqrt(rpOutDims.toDouble)
    val projCols = (0 until rpOutDims).map { j =>
      val signs = (0 until dims).map(i => rpSign(i, j)).toArray
      roundD(dot(col("embedding"), lit(signs)) * invSqrtK, 6).as(s"p$j")
    }
    table(spark, dir, "embeddings")
      .select(col("vec_id") +: projCols: _*)
      .orderBy("vec_id")
  }

  /** The DuckDB twin of [[vecRandomProjection]], generated from the same
    * [[rpSign]] matrix and fold order (left-to-right sum of s·x with a 0.0
    * init, then ·1/√k, then the 6-dp round) so every double matches
    * bit-for-bit. */
  private def rpOracle: String = {
    val invSqrtK = (1.0 / math.sqrt(rpOutDims.toDouble)).toString
    val cols = (0 until rpOutDims).map { j =>
      val signs = (0 until dims).map(i => rpSign(i, j).toString)
        .mkString("[", ", ", "]")
      s"""floor((list_reduce(list_concat([0.0], list_transform(range(1, 65),
            i -> embedding[i]::DOUBLE * ($signs)[i])), (a, x) -> a + x)
            * $invSqrtK) * 1e6 + 0.5) / 1e6 AS p$j"""
    }.mkString(",\n               ")
    s"SELECT vec_id,\n               $cols\n         FROM embeddings ORDER BY vec_id"
  }

  /** Deterministic spherical k-means — two Lloyd passes over K=8 seeds —
    * the SemDeDup-style semantic clustering primitive: cluster the corpus
    * by embedding, then dedup / curate WITHIN clusters (the coarse
    * quantizer [[simIvfTopk]] probes is trained exactly this way).
    *
    * Seeds are the first K vectors (vec_id < K — deterministic, no RNG:
    * Date-seeded inits don't replay). Assignment is max dot product
    * (vectors are unit-norm, so max-dot = min angular distance), tie →
    * smaller cluster id. New centroids are element-wise means of the
    * members, renormalized to the sphere.
    *
    * Bit-reproducibility across engines AND across partitionings — the
    * property a 1000-executor re-run needs: member sums are quantized to
    * the 1e-6 grid per element (floor(x·1e6+0.5) as BIGINT) so the
    * centroid mean is an exact integer sum in any summation order; every
    * other step (dot folds, sqrt, divisions) is identical IEEE arithmetic
    * on identical inputs. The dot folds are strict left-to-right
    * ([[graft.functions.DotProduct]]) mirrored by the oracle's sequential
    * list_reduce.
    *
    * Scale shape: centroids broadcast to every partition (K·dims doubles);
    * assignment is map-side; the only shuffles are the vec_id partial-agg
    * argmax and the (cluster, pos) centroid aggregate — K·dims cells, i.e.
    * bytes, regardless of corpus size. Lloyd at 100 TB is exactly this
    * loop iterated: broadcast-assign + tree-aggregate per pass. */
  def simKmeans(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val emb = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val seeds = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // pass 1: score n×K map-side, argmax per vector (partial-agg'd)
    val assign1 = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"), col("cid"),
        dot(col("embedding"), col("cvec")).as("aff"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cid"), struct(col("aff"), (-col("cid")).as("nc"))).as("cluster"),
        first(col("embedding")).as("embedding")) // all K rows carry the same vector
    // centroid update: quantized integer sums per (cluster, dim) — exact in
    // any partition order — then mean + renormalize
    val cellSums = assign1
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(
        sum(floor(col("v").cast(DoubleType) * 1e6 + 0.5).cast(LongType)).as("qsum"),
        count(lit(1)).as("cnt"))
      .select(col("cluster"), col("pos"),
        (col("qsum").cast(DoubleType) / (col("cnt").cast(DoubleType) * 1e6)).as("m"))
    val cent = cellSums.groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mvec"))
      .select(col("cluster"), col("mvec"),
        sqrt(dot(col("mvec"), col("mvec"))).as("nrm"))
      .select(col("cluster"),
        transform(col("mvec"), x => x / col("nrm")).as("cvec"))
    // pass 2: reassign against the updated centroids
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cluster"),
        dot(col("embedding"), col("cvec")).as("aff"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cluster"),
          struct(col("aff"), (-col("cluster")).as("nc"))).as("cluster"),
        roundD(max(col("aff")), 5).as("affinity"))
      .orderBy("vec_id")
  }

  /** Squared L2 distance as a strict left-to-right fold — bit-identical
    * to the oracle's sequential list_reduce over the same squared diffs.
    * Interpreted (aggregate∘zip_with), acceptable here because PQ
    * evaluates it on SUBVECTORS against tiny codebooks (32 sixteen-dim
    * folds per vector); if it ever became the hot loop the upgrade path
    * is a codegen'd expression exactly like [[graft.functions.DotProduct]]. */
  private def l2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, x) => acc + x)

  /** Subspace count / width / codebook size / result depth for [[simPq]]. */
  val pqM = 4; val pqS = 16; val pqK = 8; val pqTopK = 5

  /** Product quantization + asymmetric-distance search (Jégou et al. 2011,
    * "Product quantization for nearest neighbor search") — the memory side
    * of the ANN stack ([[simIvfTopk]] is the routing side; IVF-PQ is their
    * composition): each 64-d vector splits into M=4 disjoint 16-d
    * subvectors, each subspace trains its own K=8-centroid codebook (one
    * deterministic Lloyd pass from vec_id<8 seeds, the [[simKmeans]]
    * convention), and a vector is stored as just M code bytes — a 64×
    * compression of the corpus representation. A query is answered with
    * ADC: per subspace, a K-entry table of exact distances from the RAW
    * query subvector to the codebook (M·K = 32 cells, computed once per
    * query); a database vector's approximate distance is then a table
    * lookup-and-add per subspace, never touching the original vectors.
    *
    * Scale shape: codebooks are M·K·S doubles — broadcast everywhere,
    * trained with the same quantized-integer-sum tree aggregates as
    * [[simKmeans]] (shuffles carry M·K·S cells, bytes, regardless of
    * corpus size); encoding is map-side against the broadcast codebook;
    * the search's per-vector work is the (m, code) equi-join against the
    * 32-row broadcast distance table plus a quantized-long sum (exact in
    * any partition order — doubles summed across m would be order-
    * sensitive), with the bounded-heap [[graft.functions.TopKStructs]]
    * keeping only top-k per query through the shuffle. At 100 TB this is
    * how a trillion-vector index fits a cluster: 4 bytes/vector here, one
    * broadcast join + partial top-k per query batch.
    *
    * The DuckDB oracle replays the identical arithmetic (slices, strict
    * folds, quantized sums, tie-breaks) — the compare is bit-exact, so
    * the oracle checks the PQ pipeline itself, not a looser recall bound
    * (recall vs exact search is [[simAnnTopk]]'s probe pattern).
    *
    * This method trains the model and returns the pieces shared by
    * [[simPq]] (whole-corpus ADC scan) and [[simIvfPq]] (IVF-routed ADC):
    * (codes, dt) — every vector's M codes, and the per-query ADC distance
    * tables for the vec_id<3 query batch (quantized-long cells).
    *
    * The trained model is a STORED INDEX ([[graft.ops.stagedFixture]],
    * built once per (JVM, dir)): production trains PQ codebooks offline
    * and every serving query reads the code table — so the two consumers
    * measure the SEARCH, not a retrain. The parquet round-trip also gives
    * codes and dt independent lineage, so their join in [[simIvfPq]]
    * resolves to real left/right attributes (both sides of the `m`/`code`
    * equality used to trace to the one `sv` subtree, which Spark folded
    * into a trivially-true predicate — the r9 `'m == m'` warning). */
  private def pqModel(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val p = stagedFixture("pq_model", dir) { path =>
      val (codes, dt) = pqTrain(spark, dir)
      codes.write.mode("overwrite").parquet(s"$path/codes")
      dt.write.mode("overwrite").parquet(s"$path/dt")
    }
    (spark.read.parquet(s"$p/codes"), spark.read.parquet(s"$p/dt"))
  }

  private def pqTrain(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    // subvector grid: one row per (vector, subspace)
    val sv = emb.withColumn("m", explode(sequence(lit(0), lit(pqM - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * pqS + 1, lit(pqS)).as("sub"))
    val seeds = sv.filter(col("vec_id") < pqK)
      .select(col("m"), col("vec_id").cast(IntegerType).as("code"),
        col("sub").as("cvec"))
    // packed argmin key: squared distance quantized to the 1e-9 grid and
    // packed with the code into ONE long (subvector L2 ≤ 64 here, so the
    // product stays far under 2^63) — a plain min() then stays in
    // HashAggregate with a fixed-width buffer, where a min_by over a
    // struct ordering key would fall to SortAggregate on the per-vector
    // grain (the candles packed-key trick; tie on the grid → smaller
    // code, mirrored exactly by the oracle's ORDER BY on the same pack)
    def packed: Column =
      floor(col("d") * 1e9 + 0.5).cast(LongType) * pqK + col("code")
    // Lloyd assign: nearest seed per (vector, subspace)
    val assign = sv.join(broadcast(seeds), Seq("m"))
      .select(col("vec_id"), col("m"), col("sub"), col("code"),
        l2(col("sub"), col("cvec")).as("d"))
      .groupBy("vec_id", "m")
      .agg(min(packed).as("pk"), first(col("sub")).as("sub"))
      .select(col("vec_id"), col("m"),
        pmod(col("pk"), lit(pqK.toLong)).cast(IntegerType).as("code"),
        col("sub"))
    // centroid update: quantized integer sums per (m, code, pos) — exact
    // in any partition order; plain means (PQ is L2, not spherical)
    val codebook = assign
      .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy("m", "code", "pos")
      .agg(sum(floor(col("v").cast(DoubleType) * 1e6 + 0.5).cast(LongType)).as("qsum"),
        count(lit(1)).as("cnt"))
      .select(col("m"), col("code"), col("pos"),
        (col("qsum").cast(DoubleType) / (col("cnt").cast(DoubleType) * 1e6)).as("c"))
      .groupBy("m", "code")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec"))
    // encode: every vector becomes M small codes against the broadcast
    // book — same packed argmin, same HashAggregate shape
    val codes = sv.join(broadcast(codebook), Seq("m"))
      .select(col("vec_id"), col("m"), col("code"), l2(col("sub"), col("cvec")).as("d"))
      .groupBy("vec_id", "m")
      .agg(min(packed).as("pk"))
      .select(col("vec_id"), col("m"),
        pmod(col("pk"), lit(pqK.toLong)).cast(IntegerType).as("code"))
    // ADC tables: exact distance from each RAW query subvector to each
    // codebook entry, quantized to the 1e-9 grid so the cross-subspace
    // sum is an exact long in any order
    val dt = sv.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("m"), col("sub"))
      .join(broadcast(codebook), Seq("m"))
      .select(col("q_id"), col("m"), col("code"),
        floor(l2(col("sub"), col("cvec")) * 1e9 + 0.5).cast(LongType).as("qd"))
    (codes, dt)
  }

  def simPq(spark: SparkSession, dir: String): DataFrame = {
    val (codes, dt) = pqModel(spark, dir)
    val item = struct(col("qdist"), col("vec_id").as("id"))
    codes.join(broadcast(dt), Seq("m", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qd")).as("qdist"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKStructs(item, pqTopK).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("q_id"), (col("p") + 1).cast(LongType).as("rk"),
        col("t.id").as("vec_id"),
        (col("t.qdist").cast(DoubleType) / 1e9).as("dist"))
      .orderBy("q_id", "rk")
  }

  /** IVF-PQ — the full production ANN stack, composed from the two halves
    * this library already proves separately: [[simIvfTopk]]'s inverted-
    * file ROUTING (queries probe only the top-nprobe cells by
    * representative affinity — the partition-pruning move) and [[simPq]]'s
    * MEMORY layout (candidates are scored by ADC table lookups over M-byte
    * codes, never touching the original vectors). At 100 TB this is the
    * trillion-vector serving shape: the corpus is stored as codes
    * partitioned by cell; a query broadcasts its probe list + its 32-row
    * distance table, reads only the probed cells, and the per-candidate
    * work is M lookups and an exact long sum. Every stage is the already-
    * locked shape: broadcast routing frame, equality join on the cell id,
    * bounded-heap top-k. The oracle composes the identical CTE families
    * (routing + quantized ADC) so the compare stays bit-exact. */
  def simIvfPq(spark: SparkSession, dir: String,
      nprobe: Int = 3, k: Int = pqTopK): DataFrame = {
    val (codes, dt) = pqModel(spark, dir)
    val emb = table(spark, dir, "embeddings")
    // routing: identical representative/probe scheme to simIvfTopk
    val reps = emb.groupBy(col("label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("rep_emb"))
      .select(col("label").as("plabel"), col("rep_emb"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = queries.crossJoin(broadcast(reps))
      .select(col("query_id"), col("plabel"),
        roundD(dot(col("qv"), col("rep_emb")), 5).as("rep_cos"))
      .withColumn("prk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("rep_cos").desc, col("plabel"))))
      .filter(col("prk") <= nprobe)
      .select(col("query_id"), col("plabel"))
    // candidates: only vectors living in a probed cell (self excluded)
    val cand = emb.select(col("vec_id"), col("label"))
      .join(broadcast(probes),
        col("label") === col("plabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val item = struct(col("qdist"), col("vec_id").as("id"))
    // explicit frame aliases: dataframe-ref equality (dt("m") ===
    // codes("m")) is lineage-based and silently degrades to a trivially
    // true predicate when both refs resolve to one attribute — the alias
    // names pin each side to its own relation
    cand.join(codes.as("cd"), Seq("vec_id"))
      .join(broadcast(dt.as("dt")),
        col("dt.q_id") === col("query_id") &&
          col("dt.m") === col("cd.m") && col("dt.code") === col("cd.code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt.qd")).as("qdist"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKStructs(item, k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("query_id"), (col("p") + 1).cast(LongType).as("rk"),
        col("t.id").as("vec_id"),
        (col("t.qdist").cast(DoubleType) / 1e9).as("dist"))
      .orderBy("query_id", "rk")
  }

  /** SemDeDup — semantic near-duplicate pruning (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus by embedding ([[simKmeans]]),
    * compare pairs ONLY within a cluster, and drop every vector with a
    * close-enough (cosine ≥ τ) lower-id neighbor in its cluster — one
    * representative survives per tight semantic group. This is the prune
    * step the kmeans scaladoc motivates; together they are the full
    * SemDeDup pipeline over the embeddings table.
    *
    * Scale shape: the clustering is what bounds the work — candidates are
    * Σ nᵢ² over cluster sizes, never corpus² (the centroids act as a
    * learned coarse quantizer). The assignment is MATERIALIZED once; the
    * within-cluster self-join is a keyed equi-join on cluster id whose
    * only shuffle ships (cluster, id, vector) rows. At 100 TB two more
    * knobs apply, documented not faked: oversized clusters split
    * (recursive k-means) to cap nᵢ, and the in-cluster join adds
    * [[dedupEmbedding]]'s signature bands as a second key — fixture
    * clusters are small enough that the plain in-cluster join IS the
    * honest shape. */
  def dedupSemantic(spark: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    // the clustering is a STORED MODEL ([[graft.ops.stagedFixture]], once
    // per (JVM, dir)): SemDeDup trains its coarse quantizer offline and
    // every prune run reads the assignment table — the query measures the
    // within-cluster pruning, not a retrain (the parquet also gives both
    // self-join sides independent lineage, so neither re-runs Lloyd)
    val assignPath = stagedFixture("kmeans_assign", dir) { p =>
      simKmeans(spark, dir).select("vec_id", "cluster")
        .write.mode("overwrite").parquet(p)
    }
    val assign = spark.read.parquet(assignPath)
    val emb = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val m = assign.join(emb, "vec_id")
    val left = m.select(col("cluster"), col("vec_id").as("a"), col("embedding").as("ea"))
    val right = m.select(col("cluster"), col("vec_id").as("b"), col("embedding").as("eb"))
    val dups = left.join(right, Seq("cluster"))
      .filter(col("a") < col("b") && roundD(dot(col("ea"), col("eb")), 5) >= tau)
      .groupBy(col("b").as("vec_id"))
      .agg(min(col("a")).as("dup_of"))
    m.select("vec_id", "cluster")
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy("vec_id")
  }

  val oracles: Map[String, String] = {
    val annBits = (0 until 8).map { j =>
      val ws = (0 until 64).map(i => s"${weight(i, j)}.0").mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_concat([0.0], list_transform(range(1, 65),
          i -> embedding[i]::DOUBLE * ($ws)[i])), (acc, x) -> acc + x) > 0
          THEN ${1L << j} ELSE 0 END"""
    }.mkString(" + ")
    // augmented-vector signature: mag * (the same ordered fold) + the
    // 65th-dim term, identical association as the Spark expression
    val mipsBits = (0 until 8).map { j =>
      val ws = (0 until 64).map(i => s"${weight(i, j)}.0").mkString("[", ", ", "]")
      s"""CASE WHEN (mag * list_reduce(list_concat([0.0],
          list_transform(range(1, 65),
          i -> embedding[i]::DOUBLE * ($ws)[i])), (acc, x) -> acc + x)
          + sqrt(25.0 - mag * mag) * ${weight(64, j)}.0) > 0
          THEN ${1L << j} ELSE 0 END"""
    }.mkString(" + ")
    // the identical PQ arithmetic replayed relationally: same slices,
    // same strict folds, same quantized sums, same tie-breaks — bit-exact
    val pqL2 = (a: String, b: String) =>
      s"""list_reduce(list_concat([0.0], list_transform(range(1, ${pqS + 1}),
            i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))),
            (acc, x) -> acc + x)"""
    val pqCtes = s"""
      sv AS (SELECT vec_id, t.m,
                         embedding[(t.m*$pqS+1):(t.m*$pqS+$pqS)] AS sub
                  FROM embeddings
                  CROSS JOIN (SELECT unnest(range(0, $pqM)) AS m) t),
      seeds AS (SELECT m, vec_id::INTEGER AS code, sub AS cvec
                FROM sv WHERE vec_id < $pqK),
      asg0 AS (SELECT s.vec_id, s.m, s.sub, d.code,
                      ${pqL2("s.sub", "d.cvec")} AS d
               FROM sv s JOIN seeds d USING (m)),
      asg AS (SELECT vec_id, m, sub, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, m
                  ORDER BY CAST(floor(d*1e9 + 0.5) AS BIGINT) * $pqK + code)
                  AS rn FROM asg0) WHERE rn = 1),
      cq AS (SELECT m, code, t.i AS pos,
                    sum(CAST(floor(sub[t.i]::DOUBLE * 1e6 + 0.5) AS BIGINT)) AS qsum,
                    count(*) AS cnt
             FROM asg CROSS JOIN (SELECT unnest(range(1, ${pqS + 1})) AS i) t
             GROUP BY 1, 2, 3),
      cb AS (SELECT m, code,
                    list(qsum::DOUBLE / (cnt::DOUBLE * 1e6) ORDER BY pos) AS cvec
             FROM cq GROUP BY 1, 2),
      enc0 AS (SELECT s.vec_id, s.m, c.code, ${pqL2("s.sub", "c.cvec")} AS d
               FROM sv s JOIN cb c USING (m)),
      enc AS (SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, m
                  ORDER BY CAST(floor(d*1e9 + 0.5) AS BIGINT) * $pqK + code)
                  AS rn FROM enc0) WHERE rn = 1),
      dt AS (SELECT s.vec_id AS q_id, s.m, c.code,
                    CAST(floor(${pqL2("s.sub", "c.cvec")} * 1e9 + 0.5) AS BIGINT) AS qd
             FROM sv s JOIN cb c USING (m) WHERE s.vec_id < 3)"""
    val pqOracle = s"""
      WITH $pqCtes,
      ad AS (SELECT d.q_id, e2.vec_id, sum(d.qd) AS qdist
             FROM enc e2 JOIN dt d ON e2.m = d.m AND e2.code = d.code
             GROUP BY 1, 2),
      r AS (SELECT q_id, vec_id, qdist,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY qdist, vec_id) AS rk
            FROM ad)
      SELECT q_id, rk::BIGINT AS rk, vec_id, qdist::DOUBLE / 1e9 AS dist
      FROM r WHERE rk <= $pqTopK ORDER BY q_id, rk"""
    // routing CTEs identical to sim_ivf's scheme, ADC identical to vec_pq's
    val ivfpqOracle = s"""
      WITH $pqCtes,
      reps AS (SELECT label AS plabel, embedding AS rep_emb FROM (
                 SELECT label, embedding,
                        row_number() OVER (PARTITION BY label
                          ORDER BY vec_id) AS rn
                 FROM embeddings) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 3),
      pr0 AS (SELECT q.query_id, r.plabel,
                     floor(list_reduce(list_concat([0.0],
                         list_transform(range(1, 65),
                           i -> q.qv[i]::DOUBLE * r.rep_emb[i]::DOUBLE)),
                         (acc, x) -> acc + x) * 1e5 + 0.5) / 1e5 AS rep_cos
              FROM q CROSS JOIN reps r),
      probes AS (SELECT query_id, plabel FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY rep_cos DESC, plabel) AS prk FROM pr0)
                 WHERE prk <= 3),
      cand AS (SELECT p.query_id, e.vec_id
               FROM embeddings e JOIN probes p
                 ON e.label = p.plabel AND e.vec_id <> p.query_id),
      ad2 AS (SELECT c.query_id, c.vec_id, sum(d.qd) AS qdist
              FROM cand c
              JOIN enc en ON en.vec_id = c.vec_id
              JOIN dt d ON d.q_id = c.query_id
                       AND d.m = en.m AND d.code = en.code
              GROUP BY 1, 2),
      r2 AS (SELECT query_id, vec_id, qdist,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY qdist, vec_id) AS rk
             FROM ad2)
      SELECT query_id, rk::BIGINT AS rk, vec_id, qdist::DOUBLE / 1e9 AS dist
      FROM r2 WHERE rk <= $pqTopK ORDER BY query_id, rk"""
    // the Gram-space power iteration unrolled (vec_drift's pipeline,
    // ungrouped): same q = floor(x*1e6+0.5) components, HUGEINT moment +
    // upper-tri Gram sums, exact scatter C = n*Q - S1_i*S1_j, the same
    // 3-round floor(C*v/2^40 + 0.5) integer contributions, same
    // NULLS-LAST dominant-axis tie-break
    val pcaOracle = {
      def it(k: Int, prev: String) = s"""
        w$k AS (SELECT c.i,
                       CAST(sum(CAST(floor(CAST(c.c AS DOUBLE) * v.v
                           / $driftScale + 0.5) AS HUGEINT)) AS HUGEINT) AS w
                FROM cf c JOIN $prev v ON v.i = c.j
                GROUP BY 1),
        n$k AS (SELECT sqrt(CAST(sum(CAST(w AS HUGEINT) * w) AS DOUBLE))
                         AS nrm
                FROM w$k),
        v$k AS (SELECT wk.i,
                       CAST(wk.w AS DOUBLE) / nullif(n$k.nrm, 0.0) AS v
                FROM w$k AS wk, n$k)"""
      s"""
      WITH e AS MATERIALIZED (
        SELECT list_transform(range(1, 65),
                 i -> CAST(floor(embedding[i]::DOUBLE * 1e6 + 0.5)
                      AS BIGINT)) AS q
        FROM embeddings),
      st AS MATERIALIZED (
        SELECT i, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q[i]) AS HUGEINT) AS s1
        FROM e, range(1, 65) AS t(i) GROUP BY 1),
      nn AS (SELECT CAST(max(n) AS BIGINT) AS n FROM st),
      g AS MATERIALIZED (
        SELECT ti.i AS i, tj.j AS j,
               CAST(sum(CAST(q[ti.i] AS HUGEINT) * q[tj.j]) AS HUGEINT) AS qq
        FROM e, range(1, 65) AS ti(i), range(1, 65) AS tj(j)
        WHERE tj.j >= ti.i GROUP BY 1, 2),
      cu AS MATERIALIZED (
        SELECT g.i, g.j, CAST(nn.n AS HUGEINT) * g.qq - si.s1 * sj.s1 AS c
        FROM g CROSS JOIN nn
        JOIN st si ON si.i = g.i
        JOIN st sj ON sj.i = g.j),
      cf AS MATERIALIZED (
        SELECT i, j, c FROM cu
        UNION ALL
        SELECT j, i, c FROM cu WHERE i <> j),
      tr AS (SELECT CAST(sum(c) AS HUGEINT) AS tr FROM cu WHERE i = j),
      v0 AS (SELECT CAST(t.i AS BIGINT) AS i, 0.125::DOUBLE AS v
             FROM range(1, 65) AS t(i)),
      ${it(1, "v0")},
      ${it(2, "v1")},
      ${it(3, "v2")},
      td AS (SELECT CAST(i AS INTEGER) AS top_dim FROM (
         SELECT v3.i, abs(v3.v) AS av FROM v3)
         ORDER BY av DESC, i LIMIT 1)
      SELECT nn.n AS n_vectors, 64 AS dim,
             CASE WHEN tr.tr > 0 THEN
               floor(nullif(n3.nrm, 0.0) * $driftScale
                     / CAST(tr.tr AS DOUBLE) * 1e6 + 0.5) / 1e6
             END AS lambda1_share,
             td.top_dim
      FROM nn, tr, n3, td"""
    }
    // vec_drift: the identical quantized pipeline per (label, version) —
    // q = floor(x*1e6+0.5) components, HUGEINT moment + upper-tri Gram
    // sums, exact centered scatter C = n*Q - S1_i*S1_j, the same 3-round
    // power iteration with floor(C*v/2^40 + 0.5) integer contributions
    // (summed exactly, so SQL aggregation order cannot matter), and the
    // same centroid-shift cross-multiplied numerators. nullif guards the
    // norm so a degenerate stratum yields NULL in both engines.
    val driftOracle = {
      def it(k: Int, prev: String) = s"""
        w$k AS (SELECT c.label, c.ver, c.i,
                       CAST(sum(CAST(floor(CAST(c.c AS DOUBLE) * v.v
                           / $driftScale + 0.5) AS HUGEINT)) AS HUGEINT) AS w
                FROM cf c JOIN $prev v
                  ON v.label = c.label AND v.ver = c.ver AND v.i = c.j
                GROUP BY 1, 2, 3),
        n$k AS (SELECT label, ver,
                       sqrt(CAST(sum(CAST(w AS HUGEINT) * w) AS DOUBLE))
                         AS nrm
                FROM w$k GROUP BY 1, 2),
        v$k AS (SELECT wk.label, wk.ver, wk.i,
                       CAST(wk.w AS DOUBLE) / nullif(n$k.nrm, 0.0) AS v
                FROM w$k AS wk JOIN n$k USING (label, ver))"""
      s"""
      WITH e AS MATERIALIZED (
        SELECT label, CAST(vec_id % 2 AS INTEGER) AS ver,
               list_transform(range(1, 65),
                 i -> CAST(floor(embedding[i]::DOUBLE * 1e6 + 0.5)
                      AS BIGINT)) AS q
        FROM embeddings),
      st AS MATERIALIZED (
        SELECT label, ver, i,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q[i]) AS HUGEINT) AS s1
        FROM e, range(1, 65) AS t(i) GROUP BY 1, 2, 3),
      nn AS MATERIALIZED (
        SELECT label, ver, CAST(max(n) AS BIGINT) AS n FROM st GROUP BY 1, 2),
      g AS MATERIALIZED (
        SELECT label, ver, ti.i AS i, tj.j AS j,
               CAST(sum(CAST(q[ti.i] AS HUGEINT) * q[tj.j]) AS HUGEINT) AS qq
        FROM e, range(1, 65) AS ti(i), range(1, 65) AS tj(j)
        WHERE tj.j >= ti.i GROUP BY 1, 2, 3, 4),
      cu AS MATERIALIZED (
        SELECT g.label, g.ver, g.i, g.j,
               CAST(nn.n AS HUGEINT) * g.qq - si.s1 * sj.s1 AS c
        FROM g JOIN nn USING (label, ver)
        JOIN st si ON si.label = g.label AND si.ver = g.ver AND si.i = g.i
        JOIN st sj ON sj.label = g.label AND sj.ver = g.ver AND sj.i = g.j),
      cf AS MATERIALIZED (
        SELECT label, ver, i, j, c FROM cu
        UNION ALL
        SELECT label, ver, j, i, c FROM cu WHERE i <> j),
      tr AS (SELECT label, ver, CAST(sum(c) AS HUGEINT) AS tr
             FROM cu WHERE i = j GROUP BY 1, 2),
      v0 AS (SELECT label, ver, i, 0.125::DOUBLE AS v
             FROM nn, range(1, 65) AS t(i)),
      ${it(1, "v0")},
      ${it(2, "v1")},
      ${it(3, "v2")},
      sh AS (
        SELECT a.label,
               a.n AS n_old, b.n AS n_new,
               floor(sqrt(CAST(sum(num * num) AS DOUBLE))
                     / (CAST(a.n * b.n AS DOUBLE) * 1e6) * 1e6 + 0.5) / 1e6
                 AS centroid_shift
        FROM (SELECT st.label, st.i, nn.n, st.s1 FROM st JOIN nn
                USING (label, ver) WHERE st.ver = 0) a
        JOIN (SELECT st.label, st.i, nn.n, st.s1 FROM st JOIN nn
                USING (label, ver) WHERE st.ver = 1) b
          ON a.label = b.label AND a.i = b.i,
        LATERAL (SELECT a.s1 * CAST(b.n AS HUGEINT)
                        - b.s1 * CAST(a.n AS HUGEINT) AS num) t
        GROUP BY 1, 2, 3),
      shr AS (
        SELECT n3.label, n3.ver,
               CASE WHEN tr.tr > 0 THEN
                 floor(nullif(n3.nrm, 0.0) * $driftScale
                       / CAST(tr.tr AS DOUBLE) * 1e6 + 0.5) / 1e6
               END AS share
        FROM n3 JOIN tr USING (label, ver))
      SELECT sh.label, sh.n_old, sh.n_new, sh.centroid_shift,
             so.share AS lambda1_share_old,
             sn.share AS lambda1_share_new,
             floor((sn.share - so.share) * 1e6 + 0.5) / 1e6
               AS lambda1_share_delta
      FROM sh
      LEFT JOIN shr so ON so.label = sh.label AND so.ver = 0
      LEFT JOIN shr sn ON sn.label = sh.label AND sn.ver = 1
      ORDER BY sh.label"""
    }
    // ONE text each for the exact and LSH top-10 (used standalone AND as
    // the two sides of the sim_recall composition — a second copy could
    // silently drift)
    val topkOracle = s"""
        WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT a.query_id, b.vec_id,
                          floor($duckDot * 1e5 + 0.5) / 1e5 AS cosine
                   FROM q a JOIN embeddings b ON b.vec_id <> a.query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rk FROM scored)
        SELECT query_id, vec_id, cosine, rk FROM ranked WHERE rk <= 10
        ORDER BY query_id, rk"""
    val annTopkOracle = s"""
        WITH sig AS (SELECT vec_id, embedding, ($annBits)::BIGINT AS bucket
                     FROM embeddings),
        scored AS (SELECT a.query_id, b.vec_id,
                          floor($duckDot * 1e5 + 0.5) / 1e5 AS cosine
                   FROM (SELECT vec_id AS query_id, embedding, bucket
                         FROM sig WHERE vec_id < 5) a
                   JOIN sig b ON b.vec_id <> a.query_id AND (
                     ((a.bucket >> 0) & 3) = ((b.bucket >> 0) & 3) OR
                     ((a.bucket >> 2) & 3) = ((b.bucket >> 2) & 3) OR
                     ((a.bucket >> 4) & 3) = ((b.bucket >> 4) & 3) OR
                     ((a.bucket >> 6) & 3) = ((b.bucket >> 6) & 3))),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rk FROM scored)
        SELECT query_id, vec_id, cosine, rk FROM ranked WHERE rk <= 10
        ORDER BY query_id, rk"""
    Map(
      "vec_drift" -> driftOracle,
      "vec_pca" -> pcaOracle,
      "vec_rp" -> rpOracle,
      "vec_pq" -> pqOracle,
      "sim_ivfpq" -> ivfpqOracle,
      "sim_topk" -> topkOracle,
      // the identical two top-10 texts composed: per query, |exact ∩ ann|
      // both legs are the shared oracle texts composed; ranks re-derived
      // inside the window (a subquery's ORDER BY does not bind row_number)
      "sim_rrf" -> s"""
        WITH lex AS (SELECT doc_id,
                            row_number() OVER (ORDER BY score_micro DESC,
                                               doc_id) AS rank_lex
                     FROM (${graft.ops.TextOps.bm25OracleSql})),
        vec AS (SELECT vec_id AS doc_id, rk AS rank_vec
                FROM ($topkOracle) WHERE query_id = 3)
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               l.rank_lex, v.rank_vec,
               coalesce(1000000000 // (60 + l.rank_lex), 0)
                 + coalesce(1000000000 // (60 + v.rank_vec), 0) AS rrf_x1e9
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        ORDER BY rrf_x1e9 DESC, doc_id LIMIT 10""",
      "sim_recall" -> s"""
        WITH exact AS (SELECT query_id, vec_id FROM ($topkOracle)),
        ann AS (SELECT query_id, vec_id FROM ($annTopkOracle)),
        ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
               FROM exact GROUP BY 1),
        an AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_ann
               FROM ann GROUP BY 1),
        ht AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
               FROM exact e JOIN ann a
                 ON a.query_id = e.query_id AND a.vec_id = e.vec_id
               GROUP BY 1)
        SELECT ex.query_id, ex.n_exact,
               CAST(coalesce(an.n_ann, 0) AS BIGINT) AS n_ann,
               CAST(coalesce(ht.n_hit, 0) AS BIGINT) AS n_hit,
               CAST(coalesce(ht.n_hit, 0) AS BIGINT) * 1000 // ex.n_exact
                 AS recall_pm
        FROM ex LEFT JOIN an USING (query_id) LEFT JOIN ht USING (query_id)
        ORDER BY ex.query_id""",
      "sim_pairs_cosine" -> s"""
        SELECT a.vec_id AS a, b.vec_id AS b, a.label AS label,
               floor($duckDot * 1e5 + 0.5) / 1e5 AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor($duckDot * 1e5 + 0.5) / 1e5 >= 0.3
        ORDER BY a, b""",
      "sim_ann_lsh" -> s"""
        SELECT ($annBits)::BIGINT AS bucket, count(*) AS cnt
        FROM embeddings GROUP BY 1 ORDER BY bucket""",
      // OR-of-bands join ≡ Spark's banded-equality join + max-dedupe: a pair
      // appears iff any 2-bit band of the 8-bit signature matches
      "sim_prefix" -> s"""
        WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                   WHERE vec_id < 5),
        scored AS (SELECT a.query_id, b.vec_id, a.embedding AS qe,
                          b.embedding AS be,
                          floor(list_reduce(list_concat([0.0],
                            list_transform(range(1, 17),
                              i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
                            (acc, x) -> acc + x) * 1e5 + 0.5) / 1e5 AS pdot
                   FROM q a JOIN embeddings b ON b.vec_id <> a.query_id),
        short AS (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY pdot DESC, vec_id) AS prk FROM scored),
        rer AS (SELECT query_id, vec_id,
                       floor(list_reduce(list_concat([0.0],
                         list_transform(range(1, 65),
                           i -> qe[i]::DOUBLE * be[i]::DOUBLE)),
                         (acc, x) -> acc + x) * 1e5 + 0.5) / 1e5 AS cosine
                FROM short WHERE prk <= 30),
        top AS (SELECT query_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, vec_id) AS rk
                FROM rer),
        exact AS (SELECT a.query_id, b.vec_id,
                         row_number() OVER (PARTITION BY a.query_id ORDER BY
                           floor($duckDot * 1e5 + 0.5) / 1e5 DESC, b.vec_id)
                           AS xrk
                  FROM q a JOIN embeddings b ON b.vec_id <> a.query_id)
        SELECT t.query_id, t.vec_id, t.cosine, t.rk::BIGINT AS rk,
               COALESCE(e.xrk <= 10, FALSE) AS hit_full
        FROM top t LEFT JOIN (SELECT * FROM exact WHERE xrk <= 10) e
          ON e.query_id = t.query_id AND e.vec_id = t.vec_id
        WHERE t.rk <= 10
        ORDER BY t.query_id, t.rk""",
      "sim_mips" -> s"""
        WITH c AS (SELECT vec_id, embedding,
                          (1 + vec_id % 5)::DOUBLE AS mag FROM embeddings),
        sig AS (SELECT vec_id, embedding, mag, ($mipsBits)::BIGINT AS bucket
                FROM c),
        qsig AS (SELECT vec_id AS query_id, embedding,
                        ($annBits)::BIGINT AS bucket
                 FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT a.query_id, b.vec_id,
                          floor(b.mag * ($duckDot) * 1e5 + 0.5) / 1e5 AS ip
                   FROM qsig a JOIN sig b ON b.vec_id <> a.query_id AND (
                     ((a.bucket >> 0) & 3) = ((b.bucket >> 0) & 3) OR
                     ((a.bucket >> 2) & 3) = ((b.bucket >> 2) & 3) OR
                     ((a.bucket >> 4) & 3) = ((b.bucket >> 4) & 3) OR
                     ((a.bucket >> 6) & 3) = ((b.bucket >> 6) & 3))),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY ip DESC, vec_id) AS rk FROM scored)
        SELECT query_id, vec_id, ip, rk::BIGINT AS rk
        FROM ranked WHERE rk <= 10
        ORDER BY query_id, rk""",
      "sim_ann_topk" -> annTopkOracle,
      // same ordered norm fold, rounded before aggregation; decimal sums
      "dq_vec" -> """
        WITH v AS (
          SELECT label, vec_id,
                 floor(list_reduce(list_concat([0.0],
                     list_transform(range(1, 65),
                       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x) * 1e5 + 0.5) / 1e5 AS n2,
                 len(list_filter(embedding,
                     x -> isnan(x) OR isinf(x))) > 0 AS bad
          FROM embeddings)
        SELECT label, count(*) AS n_vecs,
               CAST(sum(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero,
               CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nonfinite,
               min(n2) AS min_norm2, max(n2) AS max_norm2,
               CAST(sum(CAST(n2 AS DECIMAL(18,5))) AS DOUBLE) AS sum_norm2
        FROM v GROUP BY label ORDER BY label""",
      // the sim_ann_topk twin with the label predicate folded into the
      // candidate condition, exactly as the Spark join keys it
      "sim_ann_filtered" -> s"""
        WITH sig AS (SELECT vec_id, embedding, label,
                            ($annBits)::BIGINT AS bucket
                     FROM embeddings),
        scored AS (SELECT a.query_id, a.label, b.vec_id,
                          floor($duckDot * 1e5 + 0.5) / 1e5 AS cosine
                   FROM (SELECT vec_id AS query_id, embedding, label, bucket
                         FROM sig WHERE vec_id < 5) a
                   JOIN sig b ON b.vec_id <> a.query_id
                     AND b.label = a.label AND (
                     ((a.bucket >> 0) & 3) = ((b.bucket >> 0) & 3) OR
                     ((a.bucket >> 2) & 3) = ((b.bucket >> 2) & 3) OR
                     ((a.bucket >> 4) & 3) = ((b.bucket >> 4) & 3) OR
                     ((a.bucket >> 6) & 3) = ((b.bucket >> 6) & 3))),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rk FROM scored)
        SELECT query_id, label, vec_id, cosine, rk FROM ranked WHERE rk <= 10
        ORDER BY query_id, rk""",
      // banded-LSH candidates → cosine-verified pairs → min-label keep-list;
      // the OR-of-bands condition is the oracle twin of the banded join
      "dedup_vec" -> s"""
        WITH sig AS (SELECT vec_id, embedding, ($annBits)::BIGINT AS bucket
                     FROM embeddings),
        pairs AS (SELECT x.vec_id AS a, y.vec_id AS b
                  FROM sig x JOIN sig y ON x.vec_id < y.vec_id AND (
                    ((x.bucket >> 0) & 3) = ((y.bucket >> 0) & 3) OR
                    ((x.bucket >> 2) & 3) = ((y.bucket >> 2) & 3) OR
                    ((x.bucket >> 4) & 3) = ((y.bucket >> 4) & 3) OR
                    ((x.bucket >> 6) & 3) = ((y.bucket >> 6) & 3))
                  WHERE floor(list_reduce(list_concat([0.0],
                          list_transform(range(1, 65),
                            i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)),
                          (acc, v) -> acc + v) * 1e5 + 0.5) / 1e5 >= 0.4),
        dups AS (SELECT b AS vec_id, min(a) AS dup_of FROM pairs GROUP BY 1)
        SELECT e.vec_id, d.dup_of, d.dup_of IS NULL AS keep
        FROM embeddings e LEFT JOIN dups d ON e.vec_id = d.vec_id
        ORDER BY e.vec_id""",
      "sim_ivf" -> s"""
        WITH reps AS (SELECT label AS plabel,
                             arg_min(embedding, vec_id) AS rep_emb
                      FROM embeddings GROUP BY label),
        q AS (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 5),
        pscored AS (SELECT q.query_id, q.qv, reps.plabel,
                           floor(list_reduce(list_concat([0.0],
                             list_transform(range(1, 65),
                               i -> q.qv[i]::DOUBLE * reps.rep_emb[i]::DOUBLE)),
                             (acc, v) -> acc + v) * 1e5 + 0.5) / 1e5 AS rep_cos
                    FROM q CROSS JOIN reps),
        probes AS (SELECT query_id, qv, plabel FROM (
                     SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rep_cos DESC, plabel) AS probe_rk FROM pscored)
                   WHERE probe_rk <= 3),
        scored AS (SELECT p.query_id, e.vec_id,
                          floor(list_reduce(list_concat([0.0],
                            list_transform(range(1, 65),
                              i -> p.qv[i]::DOUBLE * e.embedding[i]::DOUBLE)),
                            (acc, v) -> acc + v) * 1e5 + 0.5) / 1e5 AS cosine
                   FROM embeddings e JOIN probes p
                     ON e.label = p.plabel AND e.vec_id <> p.query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rk FROM scored)
        SELECT query_id, vec_id, cosine, rk FROM ranked WHERE rk <= 10
        ORDER BY query_id, rk""",
      // same fold order as the Spark lambdas: left-to-right with a 0 init,
      // so every double is bit-identical across engines
      "vec_q8" -> """
        WITH s AS (SELECT vec_id, embedding,
                          list_reduce(list_concat([0.0],
                            list_transform(embedding, x -> abs(x::DOUBLE))),
                            (a, b) -> greatest(a, b)) / 127.0 AS s
                   FROM embeddings),
        q AS (SELECT vec_id, embedding, s,
                     list_transform(embedding,
                       x -> floor(x::DOUBLE / s + 0.5)::BIGINT) AS qv
              FROM s)
        SELECT vec_id, 64::BIGINT AS n_dims,
               floor(s * 1e6 + 0.5) / 1e6 AS scale,
               list_reduce(list_concat([0::BIGINT], qv), (a, b) -> a + b) AS q_sum,
               floor(list_reduce(list_concat([0.0],
                       list_transform(range(1, 65),
                         i -> abs(qv[i] * s - embedding[i]::DOUBLE))),
                       (a, b) -> greatest(a, b)) * 1e6 + 0.5) / 1e6 AS max_err
        FROM q ORDER BY vec_id""",
      // the two argmax stages mirror the Spark max_by(cid, struct(aff, -cid))
      // tie-break as (aff DESC, cid ASC) row_number windows; centroid means
      // re-derive the same quantized integer sums
      "kmeans" -> s"""
        $kmeansCtes
        SELECT vec_id, cluster, floor(aff * 1e5 + 0.5) / 1e5 AS affinity
        FROM a2 ORDER BY vec_id""",
      // within-cluster pairwise prune over the SAME clustering CTEs; the
      // min(a) keep-rule mirrors Spark's groupBy(b).agg(min(a))
      "dedup_sem" -> s"""
        $kmeansCtes,
        m AS (SELECT a2.vec_id, a2.cluster, e.embedding
              FROM a2 JOIN e ON a2.vec_id = e.vec_id),
        p AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
              FROM m a JOIN m b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              WHERE floor($duckDot * 1e5 + 0.5) / 1e5 >= 0.4
              GROUP BY 1)
        SELECT m.vec_id AS vec_id, m.cluster AS cluster, p.dup_of AS dup_of,
               p.dup_of IS NULL AS keep
        FROM m LEFT JOIN p ON m.vec_id = p.vec_id
        ORDER BY vec_id""",
    )
  }

  /** Shared oracle CTE chain for the two Lloyd passes, ending in
    * `a2(vec_id, cluster, aff)` — the pass-2 assignment both [[simKmeans]]
    * and [[dedupSemantic]] build on. (A def, not a val: `oracles` above
    * initializes first and a val here would still be null then.) */
  private def kmeansCtes: String = """
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        seeds AS (SELECT vec_id AS cid, embedding AS cvec FROM e WHERE vec_id < 8),
        s1 AS (SELECT e.vec_id, e.embedding, s.cid,
                      list_reduce(list_concat([0.0], list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * s.cvec[i]::DOUBLE)),
                        (acc, x) -> acc + x) AS aff
               FROM e CROSS JOIN seeds s),
        a1 AS (SELECT vec_id, embedding, cid AS cluster FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY aff DESC, cid) AS rn FROM s1)
               WHERE rn = 1),
        cq AS (SELECT cluster, t.i AS pos,
                      sum(CAST(floor(embedding[t.i]::DOUBLE * 1e6 + 0.5) AS BIGINT)) AS qsum,
                      count(*) AS cnt
               FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
               GROUP BY 1, 2),
        cm AS (SELECT cluster, pos, qsum::DOUBLE / (cnt::DOUBLE * 1e6) AS m FROM cq),
        cv AS (SELECT cluster, list(m ORDER BY pos) AS mvec FROM cm GROUP BY cluster),
        cn AS (SELECT cluster, mvec,
                      sqrt(list_reduce(list_concat([0.0], list_transform(range(1, 65),
                        i -> mvec[i] * mvec[i])), (acc, x) -> acc + x)) AS nrm
               FROM cv),
        cent AS (SELECT cluster, list_transform(mvec, x -> x / nrm) AS cvec FROM cn),
        s2 AS (SELECT e.vec_id, c.cluster,
                      list_reduce(list_concat([0.0], list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * c.cvec[i])),
                        (acc, x) -> acc + x) AS aff
               FROM e CROSS JOIN cent c),
        a2 AS (SELECT vec_id, cluster, aff FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY aff DESC, cluster) AS rn FROM s2)
               WHERE rn = 1)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> simTopk _,
    "sim_mips" -> ((sp, d) => simMips(sp, d)),
    "sim_prefix" -> ((sp, d) => simPrefix(sp, d)),
    "sim_pairs_cosine" -> simPairsCosine _,
    "sim_ann_lsh" -> simAnnLsh _,
    "sim_ann_topk" -> ((s, d) => simAnnTopk(s, d)),
    "sim_recall" -> simRecall _,
    "sim_rrf" -> simRrf _,
    "sim_ann_filtered" -> ((s, d) => simAnnFiltered(s, d)),
    "dq_vec" -> dqVec _,
    "vec_pca" -> vecPca _,
    "vec_drift" -> vecDrift _,
    "dedup_vec" -> ((s, d) => dedupEmbedding(s, d)),
    "sim_ivf" -> ((s, d) => simIvfTopk(s, d)),
    "vec_q8" -> vecQuantize _,
    "vec_rp" -> vecRandomProjection _,
    "kmeans" -> ((s, d) => simKmeans(s, d)),
    "vec_pq" -> simPq _,
    "sim_ivfpq" -> ((s, d) => simIvfPq(s, d)),
    "dedup_sem" -> ((s, d) => dedupSemantic(s, d)),
  )
}
