package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection over `documents` — the dedup family a
  * training-data pipeline needs: exact (content hash), n-gram Jaccard,
  * MinHash+LSH banding, SimHash+Hamming banding.
  *
  * Everything is arithmetic-only Catalyst expressions (no library hashers),
  * so the DuckDB oracles can re-derive identical signatures: the shared
  * primitive is a 31-multiplier polynomial rolling hash over shingle
  * characters, mod 1e9+7 — expressible as a fold in both engines.
  *
  * Scale notes (100 TB): the LSH paths never compare all pairs — candidates
  * come from equality joins on band signatures (shuffle keyed by band), the
  * classic shingle→minhash→band→bucket-join layout. The Jaccard op joins on
  * shared shingles (keyed shuffle, skew-prone on stopword shingles — salting
  * or a document-frequency cap handles that; shingles here are 4-grams, rare
  * enough). Only the final verify step touches candidate pairs.
  */
object DedupOps {

  /** Word 4-gram shingles, distinct, of the lowercased text. */
  def shingles(c: Column): Column = {
    val toks = TextOps.tokens(c)
    array_distinct(
      when(size(toks) >= 4,
        transform(sequence(lit(1), size(toks) - 3),
          i => array_join(slice(toks, i, lit(4)), " ")))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Polynomial rolling hash of a string: fold(acc*31 + ascii(char)) mod
    * 1e9+7 — deterministic, arithmetic-only, identical in DuckDB SQL. */
  def polyHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  private val duckToks = "list_filter(string_split(lower(text),' '), t -> t <> '')"
  private val duckShingles = // 1-based i in [1, len-3] => 4-grams, distinct
    s"""list_distinct(list_transform(range(1, greatest(len(toks)-2, 1)),
        i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]))"""
  private val duckPolyHash = // fold with 0 prepended as the init accumulator
    """list_reduce(list_concat([0::BIGINT], list_transform(range(1, length(s)+1),
        i -> ascii(s[i:i]))), (acc, c) -> (acc*31 + c) % 1000000007)"""

  // ── exact dedup ──────────────────────────────────────────────────────────

  /** Exact content dedup: hash-groupBy on md5(text) — one keyed shuffle of
    * (hash, id), never the text itself at scale. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("content_hash")

  // ── n-gram Jaccard ───────────────────────────────────────────────────────

  /** Near-dup pairs by exact Jaccard over 4-gram shingle sets, found via a
    * shared-shingle equality join (no cross product): J = |A∩B| / (|A|+|B|-|A∩B|). */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val common = ex.as("x").join(ex.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        roundD(col("common").cast(DoubleType) /
          (col("sa.n") + col("sb.n") - col("common")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("a", "b")
  }

  // ── MinHash + LSH ────────────────────────────────────────────────────────

  /** 8 permutation constants (a, b) for h_j(x) = (a_j*x + b_j) mod 2^31-1. */
  private val perms = Seq(
    (1299721L, 99991L), (1299827L, 44497L), (1300021L, 86243L), (1300033L, 13466917L),
    (1300109L, 32452843L), (1300151L, 15485863L), (1300187L, 49979687L), (1300201L, 67867967L))
  private val prime = 2147483647L

  /** MinHash signatures (8 permutations) per doc, banded 4×2; candidate
    * pairs = docs sharing any band. The band join is the LSH bucket join —
    * at scale this shuffles (band_id, band_sig) keys only. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val hashed = table(spark, dir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      .select(col("doc_id"), polyHash(col("s")).as("h"))
    val mins = perms.zipWithIndex.map { case ((a, b), j) =>
      min((col("h") * a + b) % prime).as(s"m$j")
    }
    val sigs = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until 4).map { bi =>
        struct(lit(bi).as("band"),
          concat_ws(",", col(s"m${2 * bi}"), col(s"m${2 * bi + 1}")).as("sig"))
      }: _*)).as("bnd"))
      .select(col("doc_id"), col("bnd.band").as("band"), col("bnd.sig").as("sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .orderBy("a", "b")
  }

  // ── SimHash ──────────────────────────────────────────────────────────────

  /** 28-bit SimHash from shingle hashes (the polyhash spans ~30 bits): bit
    * j set when the ±1 votes of (h >> j) & 1 sum positive. Pairs within
    * Hamming distance 3 are found by 7-bit band equality (pigeonhole: ≤3
    * flipped bits leave ≥1 of 4 bands intact), then verified with
    * bit_count — banding again, never all-pairs. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hashed = table(spark, dir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      .select(col("doc_id"), polyHash(col("s")).as("h"))
    val votes = (0 until 28).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"v$j")
    }
    val sims = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 28).map(j => when(col(s"v$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("simhash"))
    val bands = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(bi =>
        struct(lit(bi).as("band"),
          shiftright(col("simhash"), bi * 7).bitwiseAND(127).as("sig"))): _*)).as("bnd"))
      .select(col("doc_id"), col("simhash"),
        col("bnd.band").as("band"), col("bnd.sig").as("sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a", "b")
  }

  // ── oracles ──────────────────────────────────────────────────────────────

  private val duckSigs = {
    val mins = perms.zipWithIndex.map { case ((a, b), j) =>
      s"min((h*$a + $b) % $prime) AS m$j"
    }.mkString(", ")
    s"""toks AS (SELECT doc_id, $duckToks AS toks FROM documents),
        sh AS (SELECT doc_id, unnest($duckShingles) AS s FROM toks WHERE len(toks) >= 4),
        hashed AS (SELECT doc_id, $duckPolyHash AS h FROM sh),
        sigs AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id)"""
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS cnt, min(doc_id) AS keep_doc_id
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "dedup_ngram_jaccard" -> s"""
      WITH toks AS (SELECT doc_id, $duckToks AS toks FROM documents),
      sh AS (SELECT doc_id, $duckShingles AS sh FROM toks WHERE len(toks) >= 4),
      sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
                 FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
      SELECT a, b, floor(common::DOUBLE / (sa.n + sb.n - common) * 1e4 + 0.5) / 1e4 AS jaccard
      FROM common JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
      WHERE floor(common::DOUBLE / (sa.n + sb.n - common) * 1e4 + 0.5) / 1e4 >= 0.5
      ORDER BY a, b""",
    "dedup_minhash" -> s"""
      WITH $duckSigs
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id AND
           ((x.m0=y.m0 AND x.m1=y.m1) OR (x.m2=y.m2 AND x.m3=y.m3) OR
            (x.m4=y.m4 AND x.m5=y.m5) OR (x.m6=y.m6 AND x.m7=y.m7))
      ORDER BY a, b""",
    "dedup_simhash" -> {
      val votes = (0 until 28)
        .map(j => s"sum(((h >> $j) & 1) * 2 - 1) AS v$j").mkString(", ")
      val bits = (0 until 28)
        .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j}::BIGINT ELSE 0 END").mkString(" + ")
      s"""
      WITH toks AS (SELECT doc_id, $duckToks AS toks FROM documents),
      sh AS (SELECT doc_id, unnest($duckShingles) AS s FROM toks WHERE len(toks) >= 4),
      hashed AS (SELECT doc_id, $duckPolyHash AS h FROM sh),
      votes AS (SELECT doc_id, $votes FROM hashed GROUP BY doc_id),
      sims AS (SELECT doc_id, $bits AS simhash FROM votes)
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
      FROM sims x JOIN sims y ON x.doc_id < y.doc_id AND
           (((x.simhash >> 0) & 127) = ((y.simhash >> 0) & 127) OR
            ((x.simhash >> 7) & 127) = ((y.simhash >> 7) & 127) OR
            ((x.simhash >> 14) & 127) = ((y.simhash >> 14) & 127) OR
            ((x.simhash >> 21) & 127) = ((y.simhash >> 21) & 127))
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
      ORDER BY a, b"""
    },
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_minhash" -> dedupMinhash _,
    "dedup_simhash" -> dedupSimhash _,
  )
}
