package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-surface plan audit (dev tool): construct every registered query
  * at sf0.001 and flag scale anti-patterns in the executed plan —
  * SortAggregate (var-width aggregation buffers), CartesianProduct and
  * BroadcastNestedLoopJoin (non-equi candidate generation). PlanSpec locks
  * the shapes individually for the load-bearing queries; this sweep
  * catches the NEXT query someone adds without a lock. Known-benign rows
  * are listed with their reason rather than silenced. */
object PlanAudit {

  /** (query, pattern) pairs that are understood and accepted. */
  private val accepted: Set[(String, String)] = Set(
    // one-row bounds/centroid frames joined without keys BY DESIGN:
    ("zorder", "BroadcastNestedLoopJoin"),
    ("zorder_wide", "BroadcastNestedLoopJoin"),
    ("zscore", "BroadcastNestedLoopJoin"),
    ("agg_stats", "BroadcastNestedLoopJoin"),
    ("sim_ann_topk", "BroadcastNestedLoopJoin"),
    // broadcast the tiny query/centroid side against every row — the
    // documented brute-force/assignment shape:
    ("sim_topk", "CartesianProduct"), ("sim_topk", "BroadcastNestedLoopJoin"),
    ("kmeans", "CartesianProduct"), ("kmeans", "BroadcastNestedLoopJoin"),
    ("sim_ivf", "CartesianProduct"), ("sim_ivf", "BroadcastNestedLoopJoin"),
    ("ppl", "BroadcastNestedLoopJoin"), // one-row total-count frame
    ("colloc", "BroadcastNestedLoopJoin"), // one-row total-count frame
    ("text_tfidf", "BroadcastNestedLoopJoin"), // one-row corpus-N frame
    // centroid-vector assembly: collect_list over the K·dims cell frame
    // (512 rows at K=8, BOUNDED regardless of corpus size) — the sort is
    // of a constant-size frame, not the data:
    ("kmeans", "SortAggregate"),
    ("sim_ivf", "SortAggregate"),
  )

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val patterns = Seq("SortAggregate", "CartesianProduct", "BroadcastNestedLoopJoin")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        patterns.filter(p.contains).foreach { pat =>
          if (accepted((name, pat))) println(s"[audit] ok(known) $name: $pat")
          else { flagged += 1; println(s"[audit] FLAG $name: $pat") }
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] FLAG $name: construction failed: ${e.getMessage}")
      }
    }
    println(s"[audit] flagged=$flagged")
    spark.stop()
  }
}
