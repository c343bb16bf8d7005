package graft.tools

import org.apache.spark.sql.SparkSession

/** Disposable local timing harness — edit freely between A/B runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    // does ta_beta's shared daily-agg subplan reuse at AQE runtime?
    val df = graft.ops.MarketOps.taBeta(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("[scratch] ReusedExchange in final plan: " +
      plan.contains("ReusedExchange"))
    println("[scratch] scan count: " +
      "FileScan".r.findAllIn(plan).length)
    spark.stop()
  }
}
