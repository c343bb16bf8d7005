package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness — not part of the driver contract. */
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
    time("warmup cc sf0.001")(graft.ops.GraphOps.connectedComponents(spark, "/root/testdata/sf0.001").collect())
    for (rep <- 1 to 2) {
      time(s"graph_cc r$rep")(graft.ops.GraphOps.connectedComponents(spark, dir).collect())
      time(s"graph_cc_incr r$rep")(graft.ops.GraphOps.connectedComponentsIncr(spark, dir).collect())
      time(s"graph_kcore r$rep")(graft.ops.GraphOps.kCore(spark, dir).collect())
      time(s"graph_pagerank r$rep")(graft.ops.GraphOps.pageRank(spark, dir).collect())
      time(s"graph_label_prop r$rep")(graft.ops.GraphOps.labelProp(spark, dir).collect())
      time(s"graph_sssp r$rep")(graft.ops.GraphOps.sssp(spark, dir).collect())
      time(s"graph_khop r$rep")(graft.ops.GraphOps.kHop(spark, dir).collect())
      time(s"text_keywords r$rep")(graft.ops.TextOps.textKeywords(spark, dir).collect())
    }
    spark.stop()
  }
}
