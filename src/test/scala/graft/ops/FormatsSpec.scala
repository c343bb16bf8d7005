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

  test("delete_cow: rewrites only the files holding target ids") {
    val cow = Formats.deleteCowPlan(spark, "/root/testdata/sf0.01")
    assert(cow.rewritten >= 1L, "the delete must touch at least one file")
    assert(cow.rewritten < cow.allFiles,
      s"COW rewrote the whole table: ${cow.rewritten} of ${cow.allFiles}")
    // the new snapshot must hold exactly the complement
    val bounds = table(spark, "/root/testdata/sf0.01", "events")
      .agg(min("user_id"), max("user_id")).head()
    val ids = Seq(bounds.getLong(0), bounds.getLong(0) + 1, bounds.getLong(1))
    val expect = table(spark, "/root/testdata/sf0.01", "events")
      .filter(!col("user_id").isin(ids: _*)).count()
    val got = cow.result.agg(sum("cnt")).head().getLong(0)
    assert(got == expect, s"post-delete row count $got != $expect")
  }

  test("compact_files: bin-packs small files losslessly, no shuffle") {
    val cp = Formats.compactPlan(spark, "/root/testdata/sf0.01")
    assert(cp.smallFiles == 64L, s"writer should emit 64 small files, got ${cp.smallFiles}")
    assert(cp.compactedFiles * 4 <= cp.smallFiles,
      s"compaction barely packed: ${cp.smallFiles} -> ${cp.compactedFiles}")
    val total = cp.result.agg(sum("ids")).head().getLong(0)
    assert(total == table(spark, "/root/testdata/sf0.01", "events").count(),
      "compaction dropped or duplicated rows")
  }

  test("scan_manifest_bloom: secondary-key point lookup skips files") {
    val bs = Formats.scanBloomPlan(spark, "/root/testdata/sf0.01")
    assert(bs.survivors >= 1L)
    // 3 point keys against 8 range-clustered files: the sketch must rule
    // out most files even though every file spans the full event_id range
    assert(bs.survivors < bs.allFiles,
      s"sketch pruned nothing: ${bs.survivors} of ${bs.allFiles} files")
    assert(bs.result.count() >= 2L, "min/max keys must both resolve")
  }

  test("scan_timetravel: v1 stays readable and bit-identical after v2 commits") {
    val dir = "/root/testdata/sf0.01"
    val tt = Formats.timeTravelPlan(spark, dir)
    // structural sharing: most of v1's files must be REFERENCED by v2,
    // not copied — the whole point of a file-list commit log
    assert(tt.carried >= 1L && tt.carried < tt.v1Files,
      s"v2 shares ${tt.carried} of ${tt.v1Files} v1 files")
    // time travel: reading as-of v1 AFTER the v2 commits reproduces the
    // original table exactly (the delete/append never touched v1's files)
    val original = table(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .orderBy("event_type")
    assert(tt.v1.collect().toSeq == original.collect().toSeq,
      "as-of-v1 readback diverged from the original table")
    // and v2 differs (the commits actually did something)
    assert(tt.result.collect().toSeq != original.collect().toSeq,
      "v2 should differ from v1 after delete+append")
  }

  test("scan_cdf: the change feed opens only commit-touched files, never carried ones") {
    val dir = "/root/testdata/sf0.01"
    val tt = Formats.timeTravelPlan(spark, dir)
    // input_file_name()/inputFiles report file: URIs; writes use plain paths
    def norm(p: String) =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val touched = (tt.hitFiles ++ tt.rewriteFiles ++ tt.appendFiles)
      .map(norm).toSet
    val deletes = spark.read.parquet(tt.hitFiles: _*)
      .exceptAll(spark.read.parquet(tt.rewriteFiles: _*))
    val inserts = spark.read.parquet(tt.appendFiles: _*)
    val feedInputs =
      (deletes.inputFiles.toSet ++ inserts.inputFiles.toSet).map(norm)
    // the 100 TB contract: CDF cost scales with the commit, not the table —
    // carried files (in both versions' lists) are never opened
    assert(feedInputs.subsetOf(touched),
      "change feed opened a file outside the touched commits")
    assert(tt.carried >= 1L,
      "probe needs carried files to prove they are skipped")
    val carriedSet = deletes.inputFiles.length + inserts.inputFiles.length
    assert(carriedSet <= touched.size, "feed read more files than touched")
    // and the feed itself is non-trivial on both sides
    assert(deletes.count() >= 1L && inserts.count() >= 1L,
      "both commits must contribute changes")
  }

  test("scan_partition_evolve: the evolved generation prunes to the selected day dirs") {
    val pe = Formats.partitionEvolvePlan(spark, "/root/testdata/sf0.01")
    assert(pe.flatFiles >= 1L, "flat generation must exist")
    // execute the partitioned side through ITS OWN physical plan so the
    // scan's numFiles metric reflects partition pruning (Dataset
    // .inputFiles lists the unpruned relation and would always show
    // every day directory)
    val plan = pe.partSide.queryExecution.executedPlan
    assert(plan.execute().count() > 0L, "partitioned side must contribute")
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan under the partitioned side"))
    val numFiles = scan.metrics("numFiles").value
    // one file per day dir (the repartition(day) write) and a ≤3-day
    // slice on the evolved generation: pruning must beat the full listing
    assert(numFiles >= 1L && numFiles <= 3L,
      s"partition pruning read $numFiles files (of ~${pe.totalDays / 2} days)")
    assert(pe.result.collect().length == 6, "straddling window must span 6 days")
  }

  test("vacuum_files: retention guards expired files; vacuum never touches the live version") {
    val dir = "/root/testdata/sf0.01"
    def exists(p: String) = java.nio.file.Files.exists(
      java.nio.file.Paths.get(
        if (p.startsWith("file:")) new java.net.URI(p).getPath else p))
    // retention = ∞: nothing may be deleted, expired candidates intact
    val safe = Formats.vacuumPlan(spark, dir, retentionMs = Long.MaxValue)
    assert(safe.removed.isEmpty, "vacuum deleted inside the retention window")
    assert(safe.expired.forall(exists), "candidate files must survive")
    // retention = 0: exactly the v1-exclusive set goes, and the live (v2)
    // readback still matches the relational rebuild
    val vp = Formats.vacuumPlan(spark, dir, retentionMs = 0L)
    assert(vp.removed.toSet == vp.expired.toSet,
      "vacuum(0) must remove exactly the expired set")
    assert(vp.expired.forall(p => !exists(p)), "expired files still on disk")
    val rows = vp.result.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("vacuum_ok") == 1))
  }

  test("publish_atomic: failed validation never flips the pointer; v1 stays intact") {
    val dir = "/root/testdata/sf0.01"
    val pp = Formats.publishPlan(spark, dir)
    // the broken staged snapshot must have been rejected: pointer still v1
    assert(pp.rejectedPointer == "v1",
      s"bad publish flipped the pointer to ${pp.rejectedPointer}")
    // readers between the attempts see exactly the v1 snapshot
    val v1Expect = table(spark, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("day") < table(spark, dir, "events")
        .agg(max(date_format(col("ts"), "yyyy-MM-dd"))).head().getString(0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .orderBy("event_type")
    assert(pp.preCommit.collect().toSeq == v1Expect.collect().toSeq,
      "reader between publishes must see the untouched v1 snapshot")
    // the good publish landed, without mutating a single v1 byte
    assert(pp.finalPointer == "v2")
    assert(pp.v1Intact, "publish must never rewrite the previous snapshot")
  }

  test("scan_branch: branch writes invisible to main; disjoint merge lands; overlap rejected") {
    val dir = "/root/testdata/sf0.01"
    val bp = Formats.scanBranchPlan(spark, dir)
    assert(bp.mainUntouchedByBranch,
      "branch work must not touch a single published main byte")
    assert(bp.mergeOk, "disjoint write-sets must fast-forward merge")
    assert(bp.conflictRejected,
      "a branch overlapping main's commits must be rejected")
    assert(bp.conflictPublishedNothing,
      "a rejected merge must leave every published main byte untouched")
    // state semantics: exp sees its own rewrite but NOT main's (and vice
    // versa); the merge sees both
    val rows = bp.result.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = table(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
    val b = ev.agg(min("day"), max("day")).head()
    val (d1, d2) = (b.getString(0), b.getString(1))
    def cnt(day: String, drop: String): Long =
      ev.filter(col("day") === day && col("event_type") =!= drop).count()
    val rawD1 = ev.filter(col("day") === d1).count()
    val rawD2 = ev.filter(col("day") === d2).count()
    assert(rows(("exp", d1)) == cnt(d1, "error") &&
      rows(("exp", d2)) == rawD2, "exp must see only its own rewrite")
    assert(rows(("main_pre_merge", d1)) == rawD1 &&
      rows(("main_pre_merge", d2)) == cnt(d2, "click"),
      "pre-merge main must see only main's rewrite")
    assert(rows(("main_merged", d1)) == cnt(d1, "error") &&
      rows(("main_merged", d2)) == cnt(d2, "click"),
      "the merge must carry both rewrites")
  }

  test("commit_conflict: overlap rejected with its partition list; published bytes untouched") {
    val dir = "/root/testdata/sf0.01"
    val cp = Formats.commitConflictPlan(spark, dir)
    // disjoint write-sets both land, even off the same stale base
    assert(cp.aCommitted && cp.bCommitted,
      "disjoint concurrent rewrites must both commit")
    // the overlapping rewrite loses, and names WHAT it lost on
    assert(!cp.cCommitted, "overlapping rewrite must be rejected")
    val d1 = table(spark, dir, "events")
      .agg(min(date_format(col("ts"), "yyyy-MM-dd"))).head().getString(0)
    assert(cp.cConflicts == Seq(d1),
      s"conflict list ${cp.cConflicts} should be exactly the contested day $d1")
    // the pointer sits at v3 and the rejection mutated nothing published
    assert(cp.finalVersion == 3)
    assert(cp.publishedUntouched,
      "a rejected commit must leave every published byte untouched")
    // final state = raw events minus the two committed error-rows rewrites
    val maxD = table(spark, dir, "events")
      .agg(max(date_format(col("ts"), "yyyy-MM-dd"))).head().getString(0)
    val expect = table(spark, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(!(col("event_type") === "error" &&
        (col("day") === d1 || col("day") === maxD)))
      .groupBy("day")
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .orderBy("day").collect().toSeq
    val got = cp.result.select("day", "cnt", "sum_value").collect().toSeq
    assert(got == expect, "final table must carry exactly A's and B's rewrites")
  }

  test("agg_incr: delta apply leaves historical partitions untouched") {
    val ip = Formats.aggIncrPlan(spark, "/root/testdata/sf0.01")
    // force the readback (the delta write already ran inside the plan call)
    val days = ip.result.select("day").distinct().collect()
      .map(_.getString(0)).sorted
    assert(days.nonEmpty && ip.deltaDays.forall(days.contains),
      "delta day missing from the maintained table")
    // every pre-delta file must survive the dynamic-overwrite apply with
    // identical path and mtime — O(delta) cost means zero historical IO
    ip.baseMtimes.foreach { case (path, mtime) =>
      val f = new java.io.File(path)
      assert(f.exists, s"dynamic overwrite deleted historical file $path")
      assert(f.lastModified() == mtime,
        s"dynamic overwrite rewrote historical file $path")
    }
  }

  test("delete_mor: delete writes only tombstones; compaction is read-identical") {
    val mor = Formats.deleteMorPlan(spark, "/root/testdata/sf0.01")
    assert(mor.tombstoneRows == 3L, "delete batch must be exactly the 3 keys")
    // the MOR delete never touches a published data byte
    mor.baseMtimes.foreach { case (path, mtime) =>
      val f = new java.io.File(path)
      assert(f.exists && f.lastModified() == mtime,
        s"MOR delete rewrote base file $path")
    }
    // compacting (applying tombstones) must not change what readers see
    val live = mor.liveRead.orderBy("event_id").collect()
    val compacted = mor.compactedRead.orderBy("event_id").collect()
    assert(live.sameElements(compacted),
      "compacted layout diverged from the tombstone-masked read")
    // and the masked read really dropped rows
    assert(mor.result.agg(
      org.apache.spark.sql.functions.sum("cnt_dropped")).head().getLong(0) > 0,
      "no rows dropped - the tombstone join is vacuous")
  }

  test("compact_zorder: the clustered layout prunes strictly more files") {
    val zo = Formats.compactZorderPlan(spark, "/root/testdata/sf0.01")
    assert(zo.filesTotal >= 8, s"fixture too small: ${zo.filesTotal} files")
    // the hash-shuffled baseline scatters every user across every file -
    // the point-range probe must touch (nearly) all of them
    assert(zo.filesHitUnsorted >= zo.filesTotal - 1,
      s"baseline unexpectedly clustered: ${zo.filesHitUnsorted}/${zo.filesTotal}")
    // the z-ordered layout confines the user range to few files
    assert(zo.filesHitZordered < zo.filesHitUnsorted / 2,
      s"zorder pruned ${zo.filesHitZordered} vs ${zo.filesHitUnsorted} - no win")
    assert(zo.filesHitZordered >= 1, "probe hit nothing - vacuous")
  }

  test("join_incr: delta algebra equals the full recompute and reads the stored view") {
    val dir = "/root/testdata/sf0.01"
    val plan = Formats.joinIncrPlan(spark, dir)
    // the maintained view must read V back from storage, not re-derive it
    val scanned = plan.result.queryExecution.executedPlan.toString
    assert(scanned.contains(plan.viewPath),
      "incremental plan must scan the stored base view")
    val recompute = graft.ops.table(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(graft.ops.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum("rev").cast("double").as("revenue"))
    val inc = plan.result
    assert(inc.exceptAll(recompute).isEmpty && recompute.exceptAll(inc).isEmpty,
      "maintained view diverged from the full recompute")
  }
}
