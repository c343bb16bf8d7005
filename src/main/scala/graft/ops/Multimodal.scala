package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: media payloads ride as opaque `binary` columns
  * with a typed metadata struct, and decode/feature-extract runs as a
  * batched partition-local stage.
  *
  * The Spark-side plumbing is real — schema, batch iteration, partition
  * locality, output contract; the actual codec is a deterministic STUB
  * (`StubDecoder`): media libraries are not available in this environment,
  * and at scale the stub swaps for a real decoder without touching the
  * pipeline shape. Batched `mapPartitions` over a typed Dataset is the Scala
  * analog of `mapInPandas` (arrow-batch UDFs): one decoder instance per
  * partition, amortized over a batch, no per-row setup cost.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,             // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded features for one asset. */
  final case class DecodedRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB decoder — deterministic fake standing in for an image/audio codec.
    * Real implementation would parse the container header and decode frames;
    * the interface (bytes in, dimensions/frames out) is what the pipeline
    * depends on. */
  object StubDecoder {
    def decode(r: MediaRow): DecodedRow = {
      // ??? real codec goes here; deterministic fake derived from payload
      val n = r.payload.length.toLong
      val sum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      DecodedRow(r.media_id, r.kind, n,
        width = (sum % 640).toInt + 1,
        height = (sum % 480).toInt + 1,
        n_frames = if (r.kind == "video") (sum % 120).toInt + 1 else 1,
        checksum = sum)
    }
  }

  /** Partition-local batched decode: the mapInPandas-shaped stage. Batching
    * (here 64 rows) is where a real codec amortizes model/codec setup. */
  def decodeAll(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decoder context per batch in a real codec
        batch.iterator.map(StubDecoder.decode)
      }
    }
  }

  /** The documents table viewed as a media corpus: utf-8 payload bytes with
    * typed metadata. Demonstrates binary-column plumbing end-to-end. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "utf-8").as("payload"),
        col("source"))
      .as[MediaRow]
  }

  /** Driver-checked query: binary metadata extraction — payload size and
    * content digest straight off the binary column (pure Catalyst, pushdown-
    * friendly). The decode stage itself is covered by MultimodalSpec. */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(encode(col("text"), "utf-8")).cast(LongType).as("n_bytes"),
        sha2(col("text"), 256).as("sha"))
      .orderBy("doc_id")

  /** Driver-checked decode: the full binary pipeline — documents → media
    * rows (binary payload + typed metadata) → batched partition-local
    * decode — with the stub codec's deterministic output twinned in the
    * oracle (the checksum is the same byte fold as
    * [[graft.functions.PolyHash]], so DuckDB re-derives width/height/
    * frames from it). When a real codec replaces the stub this query keeps
    * exercising the plumbing; only the oracle twin becomes impossible. */
  def mmDecode(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF().orderBy("media_id")

  /** Frame sampling — every k-th frame index of each video asset (the
    * mapInPandas-shaped stage a video pipeline runs before per-frame
    * featurization). Pure Catalyst on top of the decode output: an explode
    * of `sequence(0, n_frames-1, k)` — the generate stays map-side, no
    * shuffle until a downstream agg. */
  def mmFrameSample(spark: SparkSession, dir: String, every: Int = 10): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast(LongType).as("frame_idx"))
      .orderBy("media_id", "frame_idx")

  /** Resize planning — fit each decoded asset into a 224×224 box preserving
    * aspect ratio (the preprocessing step in front of any vision encoder).
    * Double arithmetic only, so DuckDB reproduces it bit-for-bit. */
  def mmResize(spark: SparkSession, dir: String, box: Int = 224): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF()
      .select(col("media_id"), col("width"), col("height"),
        least(lit(box.toDouble) / col("width"),
          lit(box.toDouble) / col("height")).as("scale"))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1.0))
          .cast(LongType).as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1.0))
          .cast(LongType).as("out_h"))
      .orderBy("media_id")

  private val decodeCte: String =
    """m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text
        FROM documents),
      c AS (
        SELECT media_id, kind,
               list_reduce(list_concat([0::BIGINT],
                 list_transform(range(1, length(text) + 1),
                   i -> ascii(text[i:i]))),
                 (acc, ch) -> (acc * 31 + ch) % 1000000007) AS checksum
        FROM m),
      dims AS (
        SELECT media_id, kind,
               (checksum % 640 + 1) AS width,
               (checksum % 480 + 1) AS height,
               CASE WHEN kind = 'video' THEN checksum % 120 + 1
                    ELSE 1 END AS n_frames
        FROM c)"""

  val oracles: Map[String, String] = Map(
    "mm_frame_sample" -> s"""
      WITH $decodeCte
      SELECT media_id, unnest(range(0, n_frames, 10)) AS frame_idx
      FROM dims WHERE kind = 'video'
      ORDER BY media_id, frame_idx""",
    "mm_resize" -> s"""
      WITH $decodeCte
      SELECT media_id, width::INT AS width, height::INT AS height,
             greatest(floor(width * least(224.0 / width, 224.0 / height)), 1)::BIGINT AS out_w,
             greatest(floor(height * least(224.0 / width, 224.0 / height)), 1)::BIGINT AS out_h
      FROM dims ORDER BY media_id""",
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                sha256(text) AS sha
         FROM documents ORDER BY doc_id""",
    // byte fold = ascii-char fold on the ASCII corpus (asserted in
    // LlmOpsSpec); width/height/frames derive from the checksum exactly as
    // StubDecoder does
    "mm_decode" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
                  CASE WHEN doc_id % 3 = 0 THEN 'image'
                       WHEN doc_id % 3 = 1 THEN 'audio'
                       ELSE 'video' END AS kind,
                  text,
                  octet_length(encode(text))::BIGINT AS n_bytes
           FROM documents),
         c AS (
           SELECT media_id, kind, n_bytes,
                  list_reduce(list_concat([0::BIGINT],
                    list_transform(range(1, length(text) + 1),
                      i -> ascii(text[i:i]))),
                    (acc, ch) -> (acc * 31 + ch) % 1000000007) AS checksum
           FROM m)
         SELECT media_id, kind, n_bytes,
                (checksum % 640 + 1)::INT AS width,
                (checksum % 480 + 1)::INT AS height,
                (CASE WHEN kind = 'video' THEN checksum % 120 + 1
                      ELSE 1 END)::INT AS n_frames,
                checksum
         FROM c ORDER BY media_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> mmBinaryMeta _,
    "mm_decode" -> mmDecode _,
    "mm_frame_sample" -> ((s, d) => mmFrameSample(s, d)),
    "mm_resize" -> ((s, d) => mmResize(s, d)),
  )
}
