package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bybit REST symbol discovery → chunked subscription frames — the
  * driver-side bootstrap of the Bybit adapter (liq-stream
  * `bybit_adapter.py:108-143`): GET `instruments-info?category=...`, take
  * `result.list[].symbol` (skipping entries without one), then subscribe in
  * chunks of `subscribe_chunk` topics `allLiquidation.<SYM>` (legacy
  * `liquidation.<SYM>` when `use_all=False`).
  *
  * The HTTP GET itself is driver-side bootstrap I/O in both systems (no
  * egress here, so the response body arrives as a recorded fixture); what
  * is modeled in Spark is everything after the wire: response parsing as a
  * `from_json` pipeline and the chunked frame synthesis that seeds the WS
  * source. */
object SymbolDiscovery {

  /** result.list[].symbol of the v5 instruments-info response. */
  val instrumentsSchema: StructType = StructType(Seq(
    StructField("retCode", IntegerType),
    StructField("result", StructType(Seq(
      StructField("category", StringType),
      StructField("list", ArrayType(StructType(Seq(
        StructField("symbol", StringType),
        StructField("status", StringType))))))))))

  /** Parse a recorded instruments-info response into the discovered symbol
    * list, in response order (`bybit_adapter.py:113-117`: keep entries with
    * a non-empty symbol). */
  def parseInstruments(spark: SparkSession, responseJson: String): Seq[String] = {
    import spark.implicits._
    Seq(responseJson).toDF("raw")
      .select(explode(
        from_json(col("raw"), instrumentsSchema)
          .getField("result").getField("list")).as("it"))
      .select(col("it.symbol").as("symbol"))
      .filter(col("symbol").isNotNull && col("symbol") =!= "")
      .as[String].collect().toSeq
  }

  /** The discovery endpoint the reference GETs
    * (`bybit_adapter.py:108-112`): v5 instruments-info for the market's
    * category. */
  def instrumentsUrl(category: String = "linear"): String =
    s"https://api.bybit.com/v5/market/instruments-info?category=$category"

  /** The full bootstrap THROUGH THE TRANSPORT SEAM
    * ([[graft.sources.HttpTransport]]): GET the instruments endpoint,
    * parse the symbol list, emit the chunked subscribe frames — the exact
    * `bybit_adapter.py:108-143` sequence. Production passes a real HTTP
    * client; specs pass [[graft.sources.RecordedHttpTransport]] and get
    * byte-identical frames, proving the seam changes no behavior. */
  def discover(spark: SparkSession, http: HttpTransport,
      category: String = "linear", chunk: Int = 100,
      useAll: Boolean = true): Seq[String] =
    discoverAt(spark, http, instrumentsUrl(category), chunk, useAll)

  /** [[discover]] against an explicit endpoint — the same bootstrap with
    * the host under the caller's control (a proxy, a mirror, or
    * LiveTransportSpec's loopback HTTP server driving the LIVE transport
    * with real socket bytes). Everything after the URL is shared. */
  def discoverAt(spark: SparkSession, http: HttpTransport, url: String,
      chunk: Int = 100, useAll: Boolean = true): Seq[String] =
    subscribeFrames(parseInstruments(spark, http.get(url)), chunk, useAll)

  /** Chunked subscribe frames (`bybit_adapter.py:124-143`): topics
    * `<prefix>.<SYM>`, at most `chunk` per frame, compact JSON. */
  def subscribeFrames(symbols: Seq[String], chunk: Int = 100,
      useAll: Boolean = true): Seq[String] = {
    val prefix = if (useAll) "allLiquidation" else "liquidation"
    symbols.grouped(math.max(1, chunk)).map { group =>
      group.map(s => "\"" + prefix + "." + s + "\"")
        .mkString("""{"op":"subscribe","args":[""", ",", "]}")
    }.toSeq
  }
}
