package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: times individual pipeline stages of the dedup ops
  * to localize regressions. Not part of the library surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    import graft.ops._
    val docs = table(spark, dir, "documents")
    time("docs.count")(docs.count())
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    time("tokens")(toks.count())
    val th = toks.select(col("doc_id"),
      transform(col("toks"), t => DedupOps.polyHash(t)).as("th"))
    time("tokenHashes")(th.count())
    time("tokenHashes agg")(th.select(sum(size(col("th")))).count())
    val hs = DedupOps.hashedShingles(spark, dir)
    time("hashedShingles explode")(hs.count())
    time("hashedShingles again")(hs.count())
    hs.explain("formatted")
    time("minhash full")(DedupOps.dedupMinhash(spark, dir).count())
    time("jaccard full")(DedupOps.dedupNgramJaccard(spark, dir).count())
    time("sim_pairs_cosine")(VectorOps.simPairsCosine(spark, dir).count())
    time("sim_ann_lsh")(VectorOps.simAnnLsh(spark, dir).count())
    spark.stop()
  }
}
