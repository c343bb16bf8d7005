package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the window aggregations (sliding/session were
  * 31% of the round-1 bench). Times each pipeline stage separately to find
  * where the cost lives. Not part of the library surface. */
object ProfileWin {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    import graft.ops._
    val events = table(spark, dir, "events")
    time("events.count warm")(events.count())
    time("events.count again")(events.count())

    // sliding: stage by stage
    val slideAgg = events
      .groupBy(window(col("ts"), "6 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
    time("slide agg only")(slideAgg.count())
    val slideFmt = slideAgg.select(tsStr(col("w.start")).as("w_start"), col("cnt"))
    time("slide agg+fmt")(slideFmt.count())
    time("slide full (orderBy)")(TimeWindows.windowSliding(spark, dir).count())
    time("slide full again")(TimeWindows.windowSliding(spark, dir).count())

    // session: stage by stage
    val sessAgg = events
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours").as("w"))
      .agg(count(lit(1)).as("cnt"))
    time("session agg only")(sessAgg.count())
    time("session full")(TimeWindows.windowSession(spark, dir).count())
    time("session full again")(TimeWindows.windowSession(spark, dir).count())

    println("=== sliding explain ===")
    TimeWindows.windowSliding(spark, dir).explain("formatted")
    println("=== session explain ===")
    TimeWindows.windowSession(spark, dir).explain("formatted")
    spark.stop()
  }
}
