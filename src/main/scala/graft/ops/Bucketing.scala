package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** End-to-end bucketed join as an oracle-checked query: write orders and
    * customer bucketed on custkey into a temp-located catalog database,
    * join co-located, aggregate. The result must equal the plain shuffling
    * join (the oracle computes it directly from the source tables) — what
    * changes is WHERE the shuffle happens: once at write time, never at
    * read time (BucketingSpec asserts the zero-Exchange plan). */
  def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    // dir created only on first need — IF NOT EXISTS ignores LOCATION on
    // later calls, so creating unconditionally would leak a temp dir per
    // invocation (the dedupIncremental rationale)
    if (!spark.catalog.databaseExists("graft_bktq")) {
      val wh = java.nio.file.Files.createTempDirectory("graft_bktq").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bktq LOCATION '$wh'")
    }
    writeBucketed(table(spark, dir, "orders").select("o_custkey", "o_totalprice"),
      "graft_bktq.orders_by_cust", buckets = 8, key = "o_custkey")
    writeBucketed(table(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
      "graft_bktq.customer_by_key", buckets = 8, key = "c_custkey")
    coLocatedJoin(spark, "graft_bktq.orders_by_cust", "graft_bktq.customer_by_key",
        "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), sumMoney(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  val oracles: Map[String, String] = Map(
    // the bucketed round-trip must be lossless: aggregate the SOURCE tables
    "join_bkt" ->
      """SELECT c_mktsegment, count(*) AS cnt,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bkt" -> joinBucketed _,
  )
}
