package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.ops._

/** Disposable local timing harness — edit freely between A/B runs.
  * Current probe: hampel window-stage variants. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val shm = new java.io.File("/dev/shm/graft-bench-tmp")
    if (shm.mkdirs() || shm.isDirectory)
      System.setProperty("java.io.tmpdir", shm.getPath)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.local.dir", shm.getPath)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val events = table(spark, dir, "events")

    def med3(x: Column, y: Column, z: Column): Column =
      greatest(least(x, y), least(greatest(x, y), z))
    def med5(a: Column, b: Column, c: Column, d: Column, e: Column): Column =
      med3(greatest(least(a, b), least(c, d)),
        least(greatest(a, b), greatest(c, d)), e)

    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val wf = w.rowsBetween(-2, 2)

    def base = events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))

    // V0: original array path
    def v0 = base
      .withColumn("fr", collect_list(col("cents")).over(wf))
      .filter(size(col("fr")) === 5)
      .withColumn("med", expr("element_at(array_sort(fr), 3)"))
      .withColumn("mad",
        expr("element_at(array_sort(transform(fr, e -> abs(e - med))), 3)"))
      .withColumn("dev", abs(col("cents") - col("med")))
      .filter(col("dev") > lit(3L) * col("mad"))
      .select("event_type", "event_id", "cents", "med", "dev")

    // V1: lag/lead + med5, filter pushdown free to substitute
    def lagged = base
      .withColumn("m2", lag(col("cents"), 2).over(w))
      .withColumn("m1", lag(col("cents"), 1).over(w))
      .withColumn("p1", lead(col("cents"), 1).over(w))
      .withColumn("p2", lead(col("cents"), 2).over(w))
      .filter(col("m2").isNotNull && col("p2").isNotNull)
    def v1 = lagged
      .withColumn("med",
        med5(col("m2"), col("m1"), col("cents"), col("p1"), col("p2")))
      .withColumn("mad", med5(
        abs(col("m2") - col("med")), abs(col("m1") - col("med")),
        abs(col("cents") - col("med")), abs(col("p1") - col("med")),
        abs(col("p2") - col("med"))))
      .withColumn("dev", abs(col("cents") - col("med")))
      .filter(col("dev") > lit(3L) * col("mad"))
      .select("event_type", "event_id", "cents", "med", "dev")

    // V2: like V1 but med pinned (blocks pushdown substitution)
    def v2 = lagged
      .withColumn("med", pinned(
        med5(col("m2"), col("m1"), col("cents"), col("p1"), col("p2"))))
      .withColumn("mad", pinned(med5(
        abs(col("m2") - col("med")), abs(col("m1") - col("med")),
        abs(col("cents") - col("med")), abs(col("p1") - col("med")),
        abs(col("p2") - col("med")))))
      .withColumn("dev", abs(col("cents") - col("med")))
      .filter(col("dev") > lit(3L) * col("mad"))
      .select("event_type", "event_id", "cents", "med", "dev")

    def agg(d: DataFrame) = d
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_outliers"), max("dev").as("max_dev_cents"))
      .orderBy("event_type")

    val variants = Seq("v0" -> (() => agg(v0)), "v1" -> (() => agg(v1)),
      "v2" -> (() => agg(v2)))
    for (pass <- 1 to 3; (n, f) <- variants) {
      val t0 = System.nanoTime()
      val df = f()
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[scratch] pass$pass $n%-4s plan=${(t1 - t0) / 1e9}%6.3f " +
        f"exec=${(t2 - t1) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
