package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which nondeterministic identity wrapper survives optimization
  * and blocks predicate-pushdown alias substitution? */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    val candidates = Seq(
      "when_rand_ge" -> when(rand(42) >= -1, split(col("text"), " ")),
      "when_rand_ne" -> when(rand(42) =!= lit(-1.0), split(col("text"), " ")),
      "shuffle_array" -> element_at(shuffle(array(split(col("text"), " "))), 1),
    )
    candidates.foreach { case (name, expr) =>
      val plan = df.select(col("text"), expr.as("th"))
        .filter(size(col("th")) >= 2)
        .queryExecution.optimizedPlan
      val s = plan.toString
      val filterAboveProject = s.indexOf("Filter") < s.indexOf("Project")
      println(s"[probe] $name: nondet-survives=${s.contains("rand") || s.contains("shuffle")} filterAboveProject=$filterAboveProject")
      println(s.linesIterator.take(4).mkString("  ", "\n  ", "\n"))
    }
    spark.stop()
  }
}
