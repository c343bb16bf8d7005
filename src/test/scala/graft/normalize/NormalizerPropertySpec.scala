package graft.normalize

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.model.Schemas

/** Property tests (SURVEY.md §5.3): normalizers are total over arbitrary
  * input (per-row dead-letter parity with the reference's try/except), the
  * output schema is always the exact unified 10-column contract, and
  * notional == price*qty whenever both factors are non-zero. One Spark job
  * per property over a generated corpus (not per sample). */
class NormalizerPropertySpec extends SparkSpec {

  private val jsonish: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.alphaNumStr.map(s => s"""{"$s": "$s"}"""),
    Gen.alphaNumStr.map(s => s"""[{"o": {"s": "$s"}}]"""),
    Gen.numStr.map(n => s"""{"E": ${n.take(10)}, "o": null}"""),
    Gen.const("""{"topic": "allLiquidation.X", "data": [{}]}"""),
    Gen.const("""{"arg": {"channel": "liquidation-orders"}, "data": [{"instId": "A-USDT-SWAP"}]}"""),
    Gen.const("""{"events": [["x", {"liquidation": {"liquidatedUser": "x"}}]]}"""),
  )

  test("normalizers are total and schema-exact over generated garbage") {
    val corpus = Gen.listOfN(200, jsonish).sample.getOrElse(Nil)
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF("raw")
    val outs = Seq(
      Normalizers.binance(df, "usdt", lit(0L)),
      Normalizers.bybit(df, "linear", lit(0L)),
      Normalizers.okx(df, "usdt", lit(0L)),
      Normalizers.hyperliquid(df, ingestMs = lit(0L)))
    outs.foreach { out =>
      assert(out.count() >= 0) // evaluates the whole pipeline; must not throw
      assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        Schemas.unified.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  test("notional == price*qty whenever both factors are non-zero") {
    import spark.implicits._
    val df = spark.createDataset(Fixtures.binance ++ Fixtures.bybit).toDF("raw")
    val all = Normalizers.binance(df, "usdt", lit(0L))
      .unionByName(Normalizers.bybit(df, "linear", lit(0L)))
    val bad = all.filter(
      col("price") =!= 0 && col("qty") =!= 0 &&
        col("notional") =!= col("price") * col("qty"))
    assert(bad.count() == 0)
  }

  test("projection is always exactly the 10 unified columns") {
    import spark.implicits._
    // scalacheck Gen sampling directly (the scalatest bridge artifact is
    // not available offline); 20 generated corpora, one job each
    (1 to 20).foreach { seed =>
      val rows = Gen.listOfN(5, jsonish)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
        .getOrElse(Nil)
      if (rows.nonEmpty) {
        val df = spark.createDataset(rows).toDF("raw")
        assert(Normalizers.binance(df, "usdt", lit(0L)).columns.toSeq ==
          Schemas.unified.fieldNames.toSeq)
      }
    }
  }
}
