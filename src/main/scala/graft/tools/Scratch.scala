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
    time("warmup")(graft.ops.GraphOps.betweenness(spark, "/root/testdata/sf0.001").collect())
    for (rep <- 1 to 4)
      time(s"betweenness r$rep")(graft.ops.GraphOps.betweenness(spark, dir).collect())
    spark.stop()
  }
}
