package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle files and sink temp dirs go to tmpfs: the sandbox's backing
    // disk periodically degrades to single-digit MB/s under co-tenant load
    // (measured 7.5 MB/s direct write while the host sat 99% CPU-idle),
    // which inflates every shuffle-or-sink query 4-10x with zero plan
    // change — exactly the noise the interleaved-min passes cannot remove
    // because it is sustained, not a stall. A production cluster provisions
    // local SSD for the shuffle/scratch role; tmpfs is that assumption at
    // fixture scale (peak usage ~100 MB at sf0.1 vs the 64 GiB tmpfs).
    val shm = new java.io.File("/dev/shm/graft-bench-tmp")
    shm.mkdirs()
    System.setProperty("java.io.tmpdir", shm.getPath) // sink tmp() dirs
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", shm.getPath) // shuffle + spill
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside the timings: JVM/codegen/file-index startup is not
    // query cost (first query otherwise absorbs ~6s of session bring-up).
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // Timing is min-across-INTERLEAVED-passes: the whole query set runs as
    // three complete passes, and each query reports its min across passes.
    // Back-to-back min-of-N (round 2) does not defeat host-level stalls — a
    // single multi-second co-tenant stall covers both adjacent runs of the
    // same query and survives the min (driver BENCH_r02: 32.6s reported for
    // a query that costs 2.3s). Interleaved, the same stall lands on
    // *different* queries in each pass, so the per-query min across passes
    // recovers the steady-state plan cost. Failures are reported explicitly
    // (-1 time + a "failed" list), never as a plausible-looking duration.
    // SPARK_GRAFT_ONLY=q1,q2 narrows the set for focused local timing runs
    // (unset in driver runs — the full set benches).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val passes = 3
    val timed: Seq[Seq[(Double, Boolean)]] = (1 to passes).map { _ =>
      names.map { case (_, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
    }
    val runs = names.zipWithIndex.map { case ((name, _), i) =>
      val perPass = timed.map(_(i))
      (name, perPass.map(_._1).min, perPass.forall(_._2))
    }
    val failed = runs.collect { case (n, _, false) => n }
    val results = runs.map { case (n, t, ok) => n -> (if (ok) t else -1.0) }
    // The whole report must stay ONE short line: the driver captures only the
    // last ~2000 chars of stdout, and full-precision doubles pushed rounds
    // 1-3 past that window (every BENCH_r*.json has "parsed": null with the
    // line's head truncated). Millisecond precision is ample for plan cost.
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // comma-decimal locale would print 0,21 — invalid JSON
    def fmt(v: Double, prec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(v))
    // Mixed per-query precision: values >= 10s print as whole seconds (a
    // 30s stall doesn't need its deciseconds, and "32" is never longer
    // than "9.9"), so one slow query can't push the line over budget and
    // drag every other query down to the coarser rung.
    def fmtQ(v: Double, prec: Int): String =
      if (v >= 9.95) fmt(v, 0) else fmt(v, prec) // 9.95 rounds to "10.0" at %.1f
    // "failed" appears only when non-empty and "runs" is dropped entirely:
    // every envelope byte competes with per-query precision for the same
    // 2000-char window (at 89+ queries the constant fields are the margin
    // between the 0.1s and 1s reporting rungs).
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    val sfName = new java.io.File(sfDir).getName // basename, same budget reason
    def line(prec: Int): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmtQ(v, prec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs$failedJson,"sf":"$sfName"}"""
    }
    // Adaptive precision: per-query values start at centiseconds and degrade
    // until the whole line fits the driver's capture: exactly the last 2000
    // chars of stdout (measured across BENCH_r{1,2,3}.json), shared with
    // sbt's ~85-char "[success]" trailer and 7-char "[info] " prefix — a
    // clipped line loses its '{"metric"' head and parses as null (exactly
    // what rounds 1-3 recorded). 2000 - 92 = 1908; BenchReportSpec pins the
    // 95-query worst case (1905 at the 0.1s rung) under this budget.
    val out = (2 to 0 by -1).map(line).find(_.length <= 1908).getOrElse(line(0))
    println(out)
    spark.stop()
  }
}
