package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: splits each registered query's bench time into
  * driver-side PLANNING (analysis + optimization + physical planning,
  * forced via queryExecution.executedPlan) and EXECUTION (the count job),
  * plus the number of Spark jobs the execution submits. The point is to
  * localize the fixed per-query constant the bench pays 278 times: if the
  * midband queries spend 200 ms in Catalyst and 300 ms scheduling 4 jobs,
  * those are different fixes (plan-shape / conf work vs job-count work).
  * Not part of the library surface.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_ONLY (comma list to narrow), SPARK_GRAFT_CONF
  * ("k=v;k=v" extra session confs — for A/B runs).
  */
object FixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shm = new java.io.File("/dev/shm/graft-bench-tmp")
    val scratch =
      if (shm.mkdirs() || shm.isDirectory) shm
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    System.setProperty("java.io.tmpdir", scratch.getPath)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", scratch.getPath)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet(): Unit
      })
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val passes = 3
    // per query: min plan time, min exec time, jobs (last pass)
    case class R(plan: Double, exec: Double, jobs: Long)
    val acc = scala.collection.mutable.Map[String, R]()
    (1 to passes).foreach { _ =>
      names.foreach { case (name, fn) =>
        try {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan // force analyze+optimize+plan
          val t1 = System.nanoTime()
          val j0 = jobCount.get()
          df.count()
          val t2 = System.nanoTime()
          val r = R((t1 - t0) / 1e9, (t2 - t1) / 1e9, jobCount.get() - j0)
          val prev = acc.getOrElse(name, R(9e9, 9e9, 0))
          acc(name) = R(math.min(prev.plan, r.plan),
            math.min(prev.exec, r.exec), r.jobs)
        } catch { case e: Throwable =>
          println(s"[fixedcost] FAIL $name: ${e.getClass.getSimpleName}")
        }
      }
    }
    val rows = acc.toSeq.sortBy { case (_, r) => -(r.plan + r.exec) }
    println(f"[fixedcost] ${"query"}%-24s ${"plan_s"}%8s ${"exec_s"}%8s ${"jobs"}%5s")
    rows.foreach { case (n, r) =>
      println(f"[fixedcost] $n%-24s ${r.plan}%8.3f ${r.exec}%8.3f ${r.jobs}%5d")
    }
    val tp = rows.map(_._2.plan).sum; val te = rows.map(_._2.exec).sum
    val tj = rows.map(_._2.jobs).sum
    println(f"[fixedcost] TOTAL plan=$tp%.1f s exec=$te%.1f s jobs=$tj (n=${rows.size})")
    spark.stop()
  }
}
