package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the bounded-heap top-k aggregate: ground-truth parity against
  * sort+limit across partial/merge/serialize paths (forced by a many-
  * partition shuffle), heap-boundary semantics, and output ordering. */
class TopKStructsSpec extends SparkSpec {

  test("matches sort+limit ground truth through partial aggregation") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(7) // force per-partition heaps + buffer serialize/merge
    val item = struct((-col("value")).as("nv"), col("event_id").as("id"))
    val got = ev.groupBy("event_type")
      .agg(TopKStructs(item, 5).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("event_type"), col("p"), (-col("t.nv")).as("value"), col("t.id"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(1)).map(r => (r.getDouble(2), r.getLong(3))).toSeq
      }
    val want = ev.select("event_type", "value", "event_id").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getDouble(1), r.getLong(2)))
          .sortBy { case (v, id) => (-v, id) }.take(5).toSeq
      }
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, rows) => assert(rows == want(k), s"group $k diverged") }
  }

  test("groups smaller than k return all rows, sorted; k bounds the rest") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("b", 2), ("b", 9), ("b", 5), ("b", 1))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(TopKStructs(struct(col("v")), 3).as("top"))
      .select(col("g"), col("top.v").as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(out("a") == Seq(1, 3))       // fewer than k: everything, ascending
    assert(out("b") == Seq(1, 2, 5))    // k smallest, ascending
  }
}
