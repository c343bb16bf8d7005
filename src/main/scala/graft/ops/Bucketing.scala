package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) storage for co-located joins — the 100 TB
  * pattern for join keys that are hit repeatedly: pay the shuffle once at
  * write time (`bucketBy` on the join key), then every subsequent join on
  * that key reads both sides already hash-partitioned and sort-ready, and
  * Catalyst plans a sort-merge join with NO Exchange on either side
  * (asserted in BucketingSpec).
  *
  * The reference's analog is its time-partitioned storage + composite
  * serving index (liq-stream `writer_csv.py:17-19`, `writer_pg.py:38-57`)
  * — storage organized so reads skip work; bucketing extends that from
  * point lookups to whole-join co-location. */
object Bucketing {

  /** Write `df` as a bucketed catalog table (`db.table`), bucketed and
    * sorted by `key` into `buckets` files per partition. Both sides of a
    * co-located join must use the same bucket count and key. */
  def writeBucketed(df: DataFrame, fqTable: String, buckets: Int,
      key: String, sortKeys: Seq[String] = Nil): Unit = {
    val keys = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(fqTable)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket specs the plan contains no shuffle — each task zips bucket i
    * of both sides. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
