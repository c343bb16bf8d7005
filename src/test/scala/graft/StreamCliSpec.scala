package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.normalize.Fixtures

/** CLI orchestrator spec: stream resolution semantics (incl. the aster/
  * hyperliquid market rewrites, `stream.py:90-122`) and an end-to-end run
  * over fixture frame files producing both fan-out sinks. */
class StreamCliSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("resolveStreams: --all roster, ex:mk list, single pair, market rewrites") {
    import StreamCli._
    assert(resolveStreams(CliArgs(all = true)) == allPairs)
    assert(resolveStreams(CliArgs(all = true)).size == 8)
    // market rewrites on the list path
    assert(resolveStreams(CliArgs(streams = "aster:coin,hyperliquid:usdt,OKX:USDT")) ==
      Seq("aster" -> "usdt", "hyperliquid" -> "usdc", "okx" -> "usdt"))
    // single-pair path rewrites too
    assert(resolveStreams(CliArgs(exchange = Some("hyperliquid"), market = Some("usdt"))) ==
      Seq("hyperliquid" -> "usdc"))
    assert(resolveStreams(CliArgs(exchange = Some("binance"), market = Some("coin"))) ==
      Seq("binance" -> "coin"))
  }

  test("resolveStreams: malformed items and missing mode fail with usable errors") {
    import StreamCli._
    // an item without a colon used to throw scala.MatchError from Array
    // destructuring; now it names the bad item
    val e1 = intercept[IllegalArgumentException](
      resolveStreams(CliArgs(streams = "binance:usdt,binance")))
    assert(e1.getMessage.contains("'binance'"))
    val e2 = intercept[IllegalArgumentException](
      resolveStreams(CliArgs(streams = "okx:")))
    assert(e2.getMessage.contains("expected exchange:market"))
    // no --all/--streams/--exchange used to fail late as "unknown exchange: ''"
    val e3 = intercept[IllegalArgumentException](resolveStreams(CliArgs()))
    assert(e3.getMessage.contains("--all"))
  }

  test("parse: flags map to CliArgs") {
    val a = StreamCli.parse(Array("--streams", "binance:usdt", "--frames-root",
      "/x", "--outdir-root", "/y", "--trigger-ms", "250", "--dry-run"))
    assert(a.streams == "binance:usdt" && a.framesRoot == "/x" &&
      a.outdirRoot == "/y" && a.triggerMs == 250L && a.dryRun)
    intercept[IllegalArgumentException](StreamCli.parse(Array("--bogus")))
  }

  test("end-to-end: fixture frames -> union of 3 streams -> partitioned CSV + parquet") {
    val framesRoot = tmp("cli_frames")
    Files.write(Paths.get(s"$framesRoot/binance.jsonl"),
      // a heartbeat in the middle: the source must drop it
      (Fixtures.binance.take(2) ++ Seq("""{"op":"ping"}""") ++ Fixtures.binance.drop(2))
        .mkString("\n").getBytes)
    Files.write(Paths.get(s"$framesRoot/okx.jsonl"),
      Fixtures.okx.mkString("\n").getBytes)
    Files.createDirectories(Paths.get(s"$framesRoot/hyperliquid"))
    Files.write(Paths.get(s"$framesRoot/hyperliquid/hour1.json"),
      Fixtures.hyperliquid.mkString("", "\n", "\n").getBytes)

    val out = tmp("cli_out")
    val (csvRows, pqRows) = StreamCli.run(spark, StreamCli.CliArgs(
      streams = "binance:usdt,okx:usdt,hyperliquid:usdc",
      framesRoot = framesRoot, outdirRoot = out, triggerMs = 100L))
    assert(csvRows > 0 && csvRows == pqRows)

    val pq = spark.read.parquet(s"$out/parquet")
    val exchanges = pq.select("exchange").distinct()
      .collect().map(_.getString(0)).toSet
    assert(exchanges == Set("binance", "okx", "hyperliquid"))
    // daily CSV rotation: the partition column is present and populated
    val csv = spark.read.option("header", "true").csv(s"$out/csv")
    assert(csv.columns.contains("day"))
    assert(csv.filter(col("day").isNull).count() == 0)
  }
}
