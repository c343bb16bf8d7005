package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Probe for the manifest-pruned scan: the whole point of a file-level
  * min/max manifest is that a selective predicate READS FEWER FILES THAN
  * EXIST — assert that directly (not just plan shape), plus equality with
  * the unpruned computation so pruning never drops a qualifying row. */
class FormatsSpec extends SparkSpec {

  test("scan_manifest: reads fewer files than exist and loses no rows") {
    val dir = "/root/testdata/sf0.01"
    val ms = Formats.scanManifestPlan(spark, dir)
    // the probe: manifest pruning must actually skip files. The writer
    // makes 8 range-clustered files and the predicate keeps ~10% of the
    // key span, so most files must be ruled out at planning time.
    assert(ms.survivors.nonEmpty, "pruning must keep the qualifying files")
    assert(ms.survivors.length < ms.allFiles,
      s"manifest pruned nothing: ${ms.survivors.length} of ${ms.allFiles} files read")
    // the executed read touches ONLY survivor files
    val readFiles = ms.result.inputFiles.toSet
    assert(readFiles.subsetOf(ms.survivors.map(f => f).toSet),
      "pruned read touched a file outside the survivor list")
    // correctness: pruned result == the same aggregate with no pruning
    // (read everything, same predicate) — pruning is a pure optimization
    val bounds = table(spark, dir, "events")
      .agg(min("user_id"), max("user_id")).head()
    val hiB = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 10
    val unpruned = table(spark, dir, "events")
      .filter(col("user_id") <= hiB)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .orderBy("event_type")
    assert(ms.result.collect().toSeq == unpruned.collect().toSeq,
      "manifest-pruned aggregate diverged from the unpruned one")
  }
}
