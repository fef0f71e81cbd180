package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.9 Multimodal columns (SURVEY.md / builder brief).
  *
  * The graded corpus has no real image/audio bytes, so media is
  * modeled as an opaque `binary` column derived from document text
  * (UTF-8 bytes) with typed metadata alongside — the Spark-side
  * plumbing (schemas, typed Datasets, partition-wise batch decode) is
  * real; only the codec is a deterministic stub, clearly marked in
  * `DecodeStub`.
  */
object Multimodal {

  /** Opaque media record: bytes + typed metadata. */
  case class MediaRecord(
      doc_id: Long,
      media: Array[Byte],
      kind: String,
      lang: String,
      n_bytes: Int
  )

  /** Output of the (stubbed) decoder. */
  case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      brightness: Double
  )

  /** STUB decoder — a real deployment would call an image codec here
    * (none is installed in this container). The stub derives
    * deterministic pseudo-features from the raw bytes so the
    * distributed plumbing stays end-to-end testable. */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.media
      val b0 = bytes(0) & 0xff
      val b1 = bytes(math.min(1, bytes.length - 1)) & 0xff
      var s = 0.0
      var i = 0
      while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
      MediaFeatures(
        r.doc_id,
        64 + b0 % 64,
        64 + b1 % 64,
        s / bytes.length / 255.0
      )
    }
  }

  /** Binary-column feature extraction with builtin expressions only:
    * byte length, SHA-256 / MD5 fingerprints, head bytes as hex. */
  val mmBinaryFeatures: Q = (spark, dir) =>
    Tables
      .documents(spark, dir)
      .withColumn("bin", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("bin")).cast("bigint").as("n_bytes"),
        sha2(col("bin"), 256).as("sha_hex"),
        md5(col("bin")).as("md5_hex"),
        expr("upper(hex(substring(bin, 1, 8)))").as("head_hex"),
        lit("application/text").as("kind")
      )
      .orderBy("doc_id")

  /** Typed-Dataset decode pipeline: binary media + metadata →
    * mapPartitions(decode) → features. mapPartitions is the Scala
    * analog of mapInPandas — the decoder sees an iterator per
    * partition, so batch-level setup (codec init at scale) happens
    * once per partition, not per row. */
  val mmDecodeStub: Q = (spark, dir) => {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        MediaRecord(id, text.getBytes("UTF-8"), "image/fake", lang, text.length)
      }
      .mapPartitions(_.map(DecodeStub.decode))
      .toDF()
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        round(col("brightness"), 6).as("brightness")
      )
      .orderBy("doc_id")
  }

  /** Frame sampling: every 32nd byte of the media stream — the shape
    * of video frame-subsampling over binary data. Sampled codes are
    * emitted comma-joined (integer strings are render-identical across
    * engines; the graded comparator cannot hash array cells). */
  val mmFrameSample: Q = (spark, dir) =>
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        expr(
          "concat_ws(',', transform(sequence(1, length(text), 32)," +
            " i -> cast(ascii(substring(text, i, 1)) as string)))"
        ).as("frames"),
        expr("size(sequence(1, length(text), 32))").as("n_frames")
      )
      .orderBy("doc_id")

  /** Perceptual-hash-shaped media dedup (average hash): 64 sampled
    * "pixels" (the stub decode — character codes, a real deployment
    * decodes luma blocks), thresholded at their own mean into a 64-bit
    * signature, then exact-grouped — identical signatures are duplicate
    * media even when trailing bytes differ. This is the image-dedup
    * bridge of the multimodal family: the hash is one map-side pass,
    * and the group step is an equi-shuffle on the 64-bit key, never a
    * pairwise compare. Emitted as a bitstring (sign-safe across
    * engines); canonical = min doc_id per group. */
  val mmPhash: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("phash")
    Tables
      .documents(spark, dir)
      .withColumn(
        "pix",
        expr("transform(sequence(1, 64), i -> ascii(substring(rpad(text, 64, ' '), i, 1)))")
      )
      .withColumn("avgp", expr("aggregate(pix, 0D, (a, x) -> a + x) / 64"))
      .withColumn(
        "phash",
        expr("concat_ws('', transform(pix, x -> IF(x >= avgp, '1', '0')))")
      )
      .select(
        col("doc_id"),
        col("phash"),
        (col("doc_id") === min("doc_id").over(w)).as("is_canonical"),
        count(lit(1)).over(w).as("group_n")
      )
      .orderBy("doc_id")
  }

  private val mmPhashSql =
    """WITH px AS (
      |  SELECT doc_id, i, ascii(substring(rpad(text, 64, ' '), CAST(i AS INT), 1)) AS v
      |  FROM documents, range(1, 65) r(i)),
      |a AS (SELECT doc_id, sum(v) / 64.0 AS m FROM px GROUP BY 1),
      |h AS (SELECT px.doc_id,
      |        string_agg(CASE WHEN v >= m THEN '1' ELSE '0' END, '' ORDER BY i) AS phash
      |      FROM px JOIN a ON px.doc_id = a.doc_id GROUP BY 1)
      |SELECT doc_id, phash,
      |  doc_id = min(doc_id) OVER (PARTITION BY phash) AS is_canonical,
      |  count(*) OVER (PARTITION BY phash) AS group_n
      |FROM h ORDER BY doc_id""".stripMargin

  /** Fixed-size chunking with positional ids and per-chunk content
    * hashes — how a multimodal/long-document pipeline shards payloads
    * for downstream batch processing. posexplode keeps the chunk index
    * without a window. */
  val mmChunk: Q = (spark, dir) =>
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        posexplode(
          expr("transform(sequence(1, length(text), 256), i -> substring(text, i, 256))")
        )
      )
      .select(
        col("doc_id"),
        col("pos").as("chunk_id"),
        length(col("col")).as("n_chars"),
        md5(col("col").cast("binary")).as("chunk_md5")
      )
      .orderBy("doc_id", "chunk_id")

  /** WEBDATASET-STYLE SHARD PACKING (round 12): assign atomic binary
    * samples to size-bounded shards and emit the per-shard INDEX
    * (sample count, byte total, id range) — the manifest a multimodal
    * training loader reads to open tar-like shards. Placement is the
    * deterministic prefix rule `shard = floor(bytes_before / target)`
    * over id order: a sample is NEVER split (a shard may overflow by
    * at most one sample), and the global running offset comes from
    * [[graft.operators.TwoPhase.prefixScan]] — one bounded O(parallelism)
    * summary collect, never a single-partition window, so the pack
    * scales to any corpus. Distinct from etl_pack_sequences, which
    * SPLITS token streams across fixed sequences; here samples are
    * atomic and the graded result is the shard manifest. */
  val mmShardPack: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val target = 64L * 1024
    val recs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("shard", LongType)))
    graft.operators.TwoPhase
      .prefixScan(recs, 8, Seq(col("doc_id")), 0L)(
        _.foldLeft(0L)((a, r) => a + r.getLong(1))
      )(_ + _)(schema) { (before, _, rows) =>
        var off = before
        rows.map { r =>
          val n = r.getLong(1)
          val out = Row(r.getLong(0), n, off / target)
          off += n
          out
        }
      }
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_samples"),
        sum("n_bytes").as("shard_bytes"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("shard")
  }

  val queries: Map[String, Q] = Map(
    "mm_binary_features" -> mmBinaryFeatures,
    "mm_decode_stub" -> mmDecodeStub,
    "mm_frame_sample" -> mmFrameSample,
    "mm_chunk" -> mmChunk,
    "mm_phash" -> mmPhash,
    "mm_shard_pack" -> mmShardPack
  )

  val oracles: Map[String, String] = Map(
    "mm_phash" -> mmPhashSql,
    // shard placement is a pure prefix rule, so DuckDB's running-sum
    // window recomputes the manifest exactly
    "mm_shard_pack" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |         COALESCE(sum(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT))
        |           OVER (ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS before
        |  FROM documents)
        |SELECT CAST(before // 65536 AS BIGINT) AS shard,
        |       count(*) AS n_samples,
        |       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
        |       min(doc_id) AS first_doc,
        |       max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,
    "mm_chunk" ->
      """SELECT doc_id, CAST((i - 1) // 256 AS INT) AS chunk_id,
        | length(substring(text, i, 256)) AS n_chars,
        | md5(substring(text, i, 256)) AS chunk_md5
        |FROM documents,
        | unnest(generate_series(1, CAST(length(text) AS INT), 256)) u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "mm_binary_features" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        | sha256(text) AS sha_hex, md5(text) AS md5_hex,
        | upper(hex(substring(text, 1, 8))) AS head_hex,
        | 'application/text' AS kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_stub" ->
      """SELECT doc_id,
        | 64 + unicode(substring(text,1,1)) % 64 AS width,
        | 64 + unicode(substring(text,2,1)) % 64 AS height,
        | round(list_aggregate(list_transform(string_split_regex(text,''),
        |   c -> CAST(unicode(c) AS DOUBLE)), 'sum') / length(text) / 255.0, 6)
        |   AS brightness
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id,
        | array_to_string(list_transform(generate_series(1, CAST(length(text) AS INT), 32),
        |   i -> CAST(unicode(substring(text, i, 1)) AS VARCHAR)), ',') AS frames,
        | len(generate_series(1, CAST(length(text) AS INT), 32)) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
