package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.normalize.Normalizers
import graft.streaming.StreamAssembly

/** CLI orchestrator — the Spark counterpart of the reference's entry point
  * (liq-stream `stream.py:15-44` argparse + `:90-122` `_resolve_streams` +
  * `:169-188` `run_all`): resolve (exchange, market) pairs, build one
  * normalized stream per pair, union them into one flow, fan out to the
  * daily-partitioned CSV + parquet sinks.
  *
  * Source mapping: the four WS exchanges replay recorded frames through the
  * custom MicroBatchStream source ([[graft.sources.WsReplayProvider]],
  * `<framesRoot>/<exchange>.jsonl`); Hyperliquid tails its hour-file
  * directory (`<framesRoot>/hyperliquid/`) exactly like the reference's
  * file adapter. The reference's 8 asyncio tasks sharing one PG writer
  * become one streaming query over an 8-way union — one checkpoint, one
  * sink transaction per micro-batch.
  */
object StreamCli {

  final case class CliArgs(
      exchange: Option[String] = None,
      market: Option[String] = None,
      all: Boolean = false,
      streams: String = "",
      framesRoot: String = "",
      outdirRoot: String = "data",
      dryRun: Boolean = false,
      triggerMs: Long = 500L)

  /** The `--all` roster (`stream.py:93-99`). */
  val allPairs: Seq[(String, String)] = Seq(
    "binance" -> "usdt", "binance" -> "coin",
    "bybit" -> "usdt", "bybit" -> "coin",
    "okx" -> "usdt", "okx" -> "coin",
    "aster" -> "usdt",        // Aster is USDT-margined
    "hyperliquid" -> "usdc")  // Hyperliquid perps settled in USDC

  def parse(argv: Array[String]): CliArgs = {
    def loop(rest: List[String], a: CliArgs): CliArgs = rest match {
      case "--exchange" :: v :: t => loop(t, a.copy(exchange = Some(v)))
      case "--market" :: v :: t => loop(t, a.copy(market = Some(v)))
      case "--all" :: t => loop(t, a.copy(all = true))
      case "--streams" :: v :: t => loop(t, a.copy(streams = v))
      case "--frames-root" :: v :: t => loop(t, a.copy(framesRoot = v))
      case "--outdir-root" :: v :: t => loop(t, a.copy(outdirRoot = v))
      case "--dry-run" :: t => loop(t, a.copy(dryRun = true))
      case "--trigger-ms" :: v :: t => loop(t, a.copy(triggerMs = v.toLong))
      case Nil => a
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    loop(argv.toList, CliArgs())
  }

  /** Market-correctness rewrite (`stream.py:105-110,117-120`): Aster is
    * USDT-margined, Hyperliquid settles in USDC — requesting any other
    * market warns and overrides. */
  private def rewrite(ex: String, mk: String): (String, String) = ex match {
    case "aster" if mk != "usdt" =>
      println("[aster] Warning: overriding market to 'usdt' (Aster is USDT-margined).")
      (ex, "usdt")
    case "hyperliquid" if mk != "usdc" =>
      println("[hyperliquid] Warning: overriding market to 'usdc' (Hyperliquid is USDC).")
      (ex, "usdc")
    case _ => (ex, mk)
  }

  /** `_resolve_streams` (`stream.py:90-122`): --all roster, or the
    * comma-separated `ex:mk` list, or the single --exchange/--market pair —
    * each path applying the market rewrites. Malformed `--streams` items and
    * a missing mode fail here with a usable message instead of a MatchError
    * / a late "unknown exchange: ''" deep in stream construction. */
  def resolveStreams(args: CliArgs): Seq[(String, String)] =
    if (args.all) allPairs
    else if (args.streams.nonEmpty)
      args.streams.split(",").toSeq.map { item =>
        item.trim.split(":") match {
          case Array(ex, mk) if ex.nonEmpty && mk.nonEmpty =>
            rewrite(ex.toLowerCase, mk.toLowerCase)
          case _ => throw new IllegalArgumentException(
            s"bad --streams item '${item.trim}': expected exchange:market")
        }
      }
    else {
      val ex = args.exchange.getOrElse(throw new IllegalArgumentException(
        "one of --all, --streams, or --exchange is required")).toLowerCase
      val mk = args.market.getOrElse("").toLowerCase
      Seq(rewrite(ex, mk))
    }

  /** One normalized stream per pair, unioned — the reference's N asyncio
    * tasks into one shared writer (`stream.py:169-188`). */
  def buildUnified(spark: SparkSession, framesRoot: String,
      pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (ex, mk) =>
      ex match {
        case "hyperliquid" =>
          StreamAssembly.hyperliquidNormalizedStream(
            StreamAssembly.hyperliquidFileStream(spark, s"$framesRoot/hyperliquid"), mk)
        case _ =>
          val raw = StreamAssembly.wsReplayStream(spark, s"$framesRoot/$ex.jsonl")
          ex match {
            case "binance" => Normalizers.binance(raw, mk)
            case "aster" => Normalizers.aster(raw, mk)
            case "bybit" => Normalizers.bybit(raw, mk)
            case "okx" => Normalizers.okx(raw, mk)
            case other =>
              throw new IllegalArgumentException(s"unknown exchange: $other")
          }
      }
    }.reduce(_ unionByName _)

  /** Run the resolved streams to completion of the recorded input (drain +
    * stop — the Smoke-style batch analog of the reference's run-forever
    * loop) and report what landed in each sink. */
  def run(spark: SparkSession, args: CliArgs): (Long, Long) = {
    val pairs = resolveStreams(args)
    println(s"[cli] streams: ${pairs.map(p => s"${p._1}:${p._2}").mkString(", ")}")
    if (args.dryRun) return (0L, 0L)
    val root = args.outdirRoot
    val csvDir = s"$root/csv"; val pqDir = s"$root/parquet"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(root))
    val unified = buildUnified(spark, args.framesRoot, pairs)
    val q = StreamAssembly.fanOutSinks(unified, csvDir, pqDir, ckpt, args.triggerMs)
    try q.processAllAvailable() finally q.stop()
    val csvRows = spark.read.option("header", "true").csv(csvDir).count()
    val pqRows = spark.read.parquet(pqDir).count()
    println(s"[cli] csv rows=$csvRows parquet rows=$pqRows -> $root")
    (csvRows, pqRows)
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }
}
