package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Disposable local timing harness — edit freely between A/B runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm
    Seq("lineitem", "orders", "events").foreach(n => table(spark, dir, n).count())
    for (p <- 1 to 3) {
      t(s"p$p benford full")(graft.ops.DataQuality.dqBenford(spark, dir).count(): Unit)
      t(s"p$p benford digits li") {
        graft.ops.DataQuality.benfordDigits(table(spark, dir, "lineitem"), "l_extendedprice")
          .groupBy("digit").agg(count(lit(1))).count(): Unit
      }
      t(s"p$p li scan+agg") {
        table(spark, dir, "lineitem").select("l_extendedprice")
          .groupBy((col("l_extendedprice") * 0).cast("int")).count().count(): Unit
      }
    }
    spark.stop()
  }
}
