package graft.streaming

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

/** JDBC sink with DDL bootstrap — the Postgres writer's table/index
  * bootstrap and batched append (liq-stream `writer_pg.py:23-57,95-137`)
  * re-expressed on Spark's JDBC writer.
  *
  * Not exercised in this environment (no database, zero egress); the code
  * path is the standard `df.write.jdbc` append, which on a cluster inherits
  * connection pooling and per-partition batched inserts
  * (`batchsize` option ≈ the reference's --pg-batch=500). Streaming callers
  * wrap [[appendBatch]] in foreachBatch (see
  * [[StreamAssembly.fanOutSinks]] for the tested parquet analog).
  */
object JdbcSink {

  /** Unified-schema DDL — port of `writer_pg.py:23-36` (types) and `:38-57`
    * (the two serving indexes: time scan + composite lookup). */
  def ddl(table: String): Seq[String] = Seq(
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  exchange TEXT NOT NULL,
       |  market TEXT NOT NULL,
       |  symbol TEXT NOT NULL,
       |  side TEXT,
       |  qty DOUBLE PRECISION,
       |  price DOUBLE PRECISION,
       |  notional DOUBLE PRECISION,
       |  ts_exch_ms BIGINT,
       |  ts_ingest_ms BIGINT,
       |  raw TEXT
       |)""".stripMargin,
    s"CREATE INDEX IF NOT EXISTS ${idxName(table, "ts")} ON $table (ts_exch_ms)",
    s"CREATE INDEX IF NOT EXISTS ${idxName(table, "emst")} ON $table (exchange, market, symbol, ts_exch_ms)",
  )

  private def idxName(table: String, suffix: String): String =
    table.replaceAll("[^A-Za-z0-9_]", "_") + "_" + suffix + "_idx"

  /** One-time DDL bootstrap over a plain JDBC connection
    * (`writer_pg.py:123-137`). */
  def ensureSchema(url: String, table: String, props: java.util.Properties): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try ddl(table).foreach(st.execute)
      finally st.close()
    } finally conn.close()
  }

  /** Append one (micro-)batch — the executemany INSERT loop
    * (`writer_pg.py:187-215`). batchsize mirrors --pg-batch; numPartitions
    * caps connections like the reference's pool max of 10. */
  def appendBatch(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 500,
      maxConnections: Int = 10): Unit =
    df.coalesce(maxConnections)
      .write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
