package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-probe for the bench's fixed floors: bare job latency,
  * DataFrameReader relation-creation cost (driver-side footer/listing per
  * spark.read.parquet call), and a cached-vs-fresh table() comparison.
  * Not part of the library surface. */
object Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[floor] $name%-34s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/op")
    }
    t("range(1).count", 20)(spark.range(1).count(): Unit)
    t("range(1,2,1,1p).count", 20)(spark.range(1L, 2L, 1L, 1).count(): Unit)
    t("rdd 1-task job", 20)(
      spark.sparkContext.parallelize(1 to 1, 1).count(): Unit)
    t("rdd 32-task job", 20)(
      spark.sparkContext.parallelize(1 to 32, 32).count(): Unit)
    t("df.count on cached plan obj", 20) {
      val df = spark.range(1L, 2L, 1L, 1).toDF("id"); df.count(): Unit
    }
    t("range shuffle count", 10)(
      spark.range(1000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
        .count().count(): Unit)
    t("read.parquet(lineitem) construct", 10)(
      spark.read.parquet(s"$sfDir/lineitem.parquet"): Unit)
    t("read.parquet(events) construct", 10)(
      spark.read.parquet(s"$sfDir/events.parquet"): Unit)
    val cached = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("cached df re-plan count", 10)(cached.count(): Unit)
    t("fresh df count", 10)(
      spark.read.parquet(s"$sfDir/lineitem.parquet").count(): Unit)
    t("fresh events scan+agg", 5) {
      val df = graft.ops.table(spark, sfDir, "events")
      df.groupBy("event_type").count().count(): Unit
    }
    t("localCheckpoint tiny", 5)(
      spark.range(100).toDF("id").localCheckpoint().count(): Unit)
    spark.stop()
  }
}
