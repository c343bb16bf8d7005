package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable local timing harness — edit freely between A/B runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(graft.ops.TextOps.textKeywords(spark, "/root/testdata/sf0.001").collect())
    // decompose text_keywords' cost: tokenize+bigrams+distinct vs the
    // pagerank rounds
    import graft.ops._
    val docs = graft.ops.table(spark, dir, "documents")
    val stop = TextOps.stopwords
    for (rep <- 1 to 3) {
      time(s"tk full r$rep")(TextOps.textKeywords(spark, dir).collect())
      val edges = time(s"tk edges r$rep") {
        val t = TextOps.tokens(col("text"))
        val pairs = docs.select(t.as("t"))
          .select(explode(transform(
            slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
            (x, i) => struct(x.as("a"), element_at(col("t"), i + lit(2)).as("b"))))
            .as("bg"))
          .select(col("bg.a").as("a"), col("bg.b").as("b"))
          .filter(col("a") =!= col("b") &&
            !col("a").isin(stop: _*) && !col("b").isin(stop: _*))
        materialize(
          pairs.select(col("a").as("src"), col("b").as("dst"))
            .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
            .distinct())
      }
      println(s"[scratch] edge count = ${edges.count()}")
      time(s"tk pagerank r$rep")(GraphOps.pageRankOf(edges).collect())
    }
    spark.stop()
  }
}
