package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time window aggregations: tumbling, sliding, session.
  *
  * The reference's only time bucketing is the daily-rotated CSV file
  * (liq-stream `writer_csv.py:17-31`) — a tumbling 1-day window over ingest
  * time — and its CHANGELOG dashboards do "last 6h activity" style windowed
  * counts (`CHANGELOG.md:12-14`). Here they are proper event-time windows over
  * the `events` table; the streaming variants (with watermarks) reuse the same
  * expressions in graft.streaming.
  */
object TimeWindows {

  /** Tumbling 1-day window — the CSV daily-rotation semantics
    * (liq-stream `writer_csv.py:17-31`) as an event-time aggregate. Window
    * starts are epoch-aligned so results are partition-count independent. */
  def windowTumblingDaily(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("sum_value"))
      .orderBy("day")

  /** Sliding window: 6-hour windows advancing every hour ("last 6h activity",
    * liq-stream `CHANGELOG.md:14`). Each event lands in exactly 6 windows;
    * the expansion happens map-side before the keyed shuffle. */
  def windowSliding(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "6 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(tsStr(col("w.start")).as("w_start"), col("cnt"))
      .orderBy("w_start")

  /** Session window per user with an 8-hour inactivity gap — liquidation
    * cascade/burst detection. A new session starts when the gap from the
    * previous event is >= the timeout (Spark sessions span [ts, last+gap)). */
  def windowSession(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours").as("w"))
      .agg(count(lit(1)).as("cnt"), sumMoney(col("value")).as("sum_value"))
      .select(
        col("user_id"), tsStr(col("w.start")).as("session_start"),
        col("cnt"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Batch analog of the daily-rotating CSV sink (liq-stream
    * `writer_csv.py:12-39`): write events partitioned by UTC day, read the
    * partitioned result back, count rows per partition. Exercises the
    * partitionBy write path + partition-pruned read (dynamic partition
    * discovery); the count-per-day must match a direct aggregation. */
  def sinkCsvDaily(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_csv_daily").toString
    table(spark, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day")
      .option("header", "true").csv(out)
    spark.read.option("header", "true").csv(out)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")
  }

  val oracles: Map[String, String] = Map(
    "window_tumbling_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                count(*) AS cnt,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY day""",
    "window_sliding" ->
      """SELECT strftime(date_trunc('hour', ts) - k * INTERVAL 1 HOUR,
                         '%Y-%m-%d %H:%M:%S.%f') AS w_start,
                count(*) AS cnt
         FROM events, unnest(range(0, 6)) t(k)
         GROUP BY 1 ORDER BY w_start""",
    "window_session" ->
      """WITH g AS (
           SELECT user_id, ts, value,
                  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL 8 HOUR OR
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS new_session
           FROM events),
         s AS (
           SELECT user_id, ts, value,
                  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                count(*) AS cnt,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "sink_csv_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY day""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_tumbling_daily" -> windowTumblingDaily _,
    "window_sliding" -> windowSliding _,
    "window_session" -> windowSession _,
    "sink_csv_daily" -> sinkCsvDaily _,
  )
}
