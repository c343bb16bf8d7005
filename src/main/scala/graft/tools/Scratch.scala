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
    val edges0 = GraphOps.coPurchaseEdges(spark, dir)
    val canon = derivedFrame(edges0, "canon")(edges0
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct())
    println(s"[scratch] canon rows = ${rowsOf(canon)}")
    val loopSpark0 = loopSession(spark, rowsOf(canon))
    val loopSpark = sys.env.get("SCRATCH_CODEGEN") match {
      case Some("off") =>
        val ns = loopSpark0.newSession()
        loopSpark0.conf.getAll.foreach { case (k, v) =>
          try ns.conf.set(k, v) catch { case _: Throwable => () } }
        ns.conf.set("spark.sql.codegen.wholeStage", "false")
        ns
      case _ => loopSpark0
    }
    println(s"[scratch] loop parts = ${loopSpark.conf.get("spark.sql.shuffle.partitions")}")
    var cur = transplant(loopSpark, canon)
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
    def fp(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum((col("lo") * 1299721L + col("hi")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    for (b <- 1 to 8) {
      var nx: DataFrame = null
      t(s"b$b plan+chain") { nx = starRound(starRound(cur)) }
      var next: DataFrame = null
      t(s"b$b materialize") { next = materialize(nx) }
      t(s"b$b fingerprint") {
        val (n, s) = fp(next); println(s"  fp=$n/$s")
      }
      cur = next
    }
    spark.stop()
  }
}
