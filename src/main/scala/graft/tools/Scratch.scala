package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

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
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val edges = GraphOps.coPurchaseEdges(spark, dir)
    val canon = derivedFrame(edges, "canon")(edges
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct())
    val loopSpark = loopSession(spark, rowsOf(canon))
    val cur = transplant(loopSpark, canon)
    def starRound(in: DataFrame): DataFrame = {
      val sym = in.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(in.select(col("hi").as("u"), col("lo").as("v")))
      val large = sym
        .withColumn("m", least(col("u"), min(col("v")).over(
          Window.partitionBy("u"))))
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))
      val wH = Window.partitionBy("hi")
      large
        .withColumn("m", min(col("lo")).over(wH))
        .withColumn("rn", row_number().over(wH.orderBy("lo")))
        .select(explode(when(col("rn") === 1,
            array(struct(col("m").as("lo"), col("hi").as("hi")),
              struct(col("m").as("lo"), col("lo").as("hi"))))
          .otherwise(array(
            struct(col("m").as("lo"), col("lo").as("hi"))))).as("e"))
        .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
    }
    for (p <- 1 to 3) {
      t(s"p$p plan-only") { starRound(starRound(cur)).queryExecution.executedPlan: Unit }
      t(s"p$p count-only") { starRound(starRound(cur)).count(): Unit }
      t(s"p$p collect-only") { starRound(starRound(cur)).collect(): Unit }
      t(s"p$p checkpoint") { starRound(starRound(cur)).localCheckpoint().unpersist(): Unit }
      t(s"p$p 1round-count") { starRound(cur).count(): Unit }
    }
    spark.stop()
  }
}
