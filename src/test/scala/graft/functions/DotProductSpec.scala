package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec

/** Specs for the native dot_product Catalyst expression: bit-exact parity
  * with the interpreted zip_with/aggregate fold it replaces (on the real
  * embeddings corpus, where the oracle hash-compare depends on it), null
  * and length-mismatch semantics, mixed element types, and codegen
  * participation. */
class DotProductSpec extends SparkSpec {

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-exact parity with the interpreted fold on the embeddings corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val mismatches = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(
        DotProduct(col("qv"), col("embedding")).as("native"),
        foldDot(col("qv"), col("embedding")).as("fold"))
      // bitwise equality, not epsilon: the oracle hash-compare needs it
      .filter(col("native") =!= col("fold") ||
        col("native").isNull =!= col("fold").isNull)
      .count()
    assert(mismatches == 0)
  }

  test("mixed float/double inputs and literal weight arrays") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val w = array((0 until 64).map(i => lit((i % 7 - 3).toDouble)): _*)
    val rows = emb.limit(10)
      .select(DotProduct(col("embedding"), w).as("native"),
        foldDot(col("embedding"), w).as("fold"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null semantics match zip_with: null element or length mismatch -> null") {
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      foldDot(col("a"), col("b")).as("fold")).collect()
    assert(out(0).getDouble(0) == 11.0 && out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    // null array in -> null out
    val nn = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
      .select(DotProduct(col("a"), col("b"))).collect()
    assert(nn(0).isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(DotProduct(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_product"))
  }
}
