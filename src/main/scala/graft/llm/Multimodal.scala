package graft.llm

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 B.10 / north-star multimodal columns: media as opaque `binary`
  * columns with typed metadata, processed by per-partition feature
  * extractors.
  *
  * No image/audio codecs exist in this container, so the decode step is a
  * deterministic stub ([[FakeDecoder]]); everything around it — the binary
  * column, the metadata struct, the `mapPartitions` batch shape, the output
  * schema — is the real plumbing a codec would drop into. The declared
  * queries restrict themselves to exact byte arithmetic so they remain
  * oracle-checkable.
  *
  * Scale notes: the extractor is `mapPartitions`, so a real decoder
  * amortizes model/codec init once per partition (the reason production
  * pipelines use partition-wise UDFs); binary payloads stay columnar in
  * parquet and are never collected to the driver.
  */
object Multimodal {

  /** Stub decoder: stands in for an image/audio codec. Deterministic pure
    * byte arithmetic ⇒ testable; swap `decode` for a real codec call and
    * the pipeline around it is unchanged.
    */
  object FakeDecoder {
    /** "Decode" a payload into (width, height, mean_luma): header-style
      * fields derived from leading bytes and a byte-mean.
      */
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val w = 64 + (if (payload.nonEmpty) (payload(0) & 0x7f) else 0)
      val h = 64 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
      val luma =
        if (payload.isEmpty) 0.0
        else payload.map(b => (b & 0xff).toDouble).sum / payload.length
      (w, h, luma)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** The capability: binary payload column + metadata struct → per-partition
    * feature extraction. Exercised by MultimodalSpec; the declared queries
    * below cover the oracle-checkable subset.
    */
  def extractFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { it =>
      // codec/model init would happen HERE, once per partition
      it.map { r =>
        // NULL payload (a NULL text upstream) → NULL features, not an
        // executor NPE — the bad-row posture (round-8 DegenerateSweepSpec)
        val p = r.getAs[Array[Byte]]("payload")
        if (p == null) Row(r.getLong(0), null, null, null)
        else {
          val (w, h, luma) = FakeDecoder.decode(p)
          Row(r.getLong(0), w, h, luma)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** DuckDB expression for BYTE `i` (1-based) of `text`'s UTF-8 encoding,
    * given `hx` = `hex(text)`: each byte is a hex pair, decoded with
    * strpos arithmetic. Replaces the round-9 `ascii(substring(...))`
    * replica, which equals the byte only for ASCII text — the round-10
    * unicode parity set caught the divergence (é is 2 bytes / 1 code
    * point, so frame boundaries and header bytes drifted on multibyte
    * docs). Past-the-end: substring yields '' and strpos(_, '') = 1, so
    * the decoded byte is 0 — exactly [[FakeDecoder.decode]]'s default for
    * a missing header byte, pinned by the unicode sweep's 1-byte docs.
    */
  private def byteSql(hx: String, i: String): String =
    s"(16 * (strpos('0123456789ABCDEF', substring($hx, 2 * ($i) - 1, 1)) - 1)" +
      s" + strpos('0123456789ABCDEF', substring($hx, 2 * ($i), 1)) - 1)"

  /** documents.text encoded as the stand-in binary payload. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        col("lang")))

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("checksum", LongType)))

  /** Frame sampling: treat the payload as fixed-size frames (16 bytes) and
    * emit every `stride`-th frame with a byte checksum — the video
    * frame-sample shape (1 row in → k frame rows out, decode once per
    * partition). A real codec would replace the checksum with a decoded
    * frame tensor; the iteration/batching plumbing is identical.
    */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        // NULL payload → no frames (DuckDB's range(NULL) unnests to zero
        // rows, so the oracle already agrees) — round-8 DegenerateSweepSpec
        val p = r.getAs[Array[Byte]]("payload")
        if (p == null) Iterator.empty
        else {
        val nFrames = (p.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(start + frameBytes, p.length)
          var sum = 0L
          var i = start
          while (i < end) { sum += (p(i) & 0xff); i += 1 }
          Row(r.getLong(0), f.toLong, sum)
        }
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  val defs: Seq[QueryDef] = Seq(

    // Binary column + typed metadata, filtered on nested metadata fields;
    // output is flat exact byte arithmetic → exact oracle.
    QueryDef(
      "multimodal_binary_meta",
      (s, d) => {
        withPayload(Tables.documents(s, d))
          .filter(col("media_meta.n_bytes") > 70 && col("media_meta.lang") =!= "zh")
          .select(
            col("doc_id"),
            col("media_meta.mime").as("mime"),
            col("media_meta.n_bytes").cast("long").as("n_bytes"),
            substring(hex(col("payload")), 1, 8).as("head_hex"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'text/plain' AS mime,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  substring(upper(hex(encode(text))), 1, 8) AS head_hex
             |FROM documents WHERE octet_length(encode(text)) > 70 AND lang <> 'zh'
             |ORDER BY doc_id""".stripMargin)),

    // The mapPartitions extractor as a declared query: the stub decode is
    // plain byte arithmetic, so DuckDB replays it exactly (byte 1/2 of
    // UTF-8 text = ascii of chars; mean byte value over ASCII text =
    // mean ascii). Proves the partition-wise pipeline end-to-end.
    QueryDef(
      "multimodal_decode_features",
      (s, d) => {
        val feats = extractFeatures(withPayload(Tables.documents(s, d)))
        feats.select(
          col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          Exact.roundN(col("mean_luma"), 4).as("mean_luma"))
          .orderBy("doc_id")
      },
      // FakeDecoder defines an EMPTY payload as luma 0.0 (a black frame),
      // where DuckDB's list-sum over the empty range is NULL — hence the
      // CASE's zero branch; a NULL text stays NULL on both sides (hex(NULL)
      // propagates). Byte-exact via hex pairs (round-10 unicode set): the
      // decoder reads UTF-8 BYTES, so ascii(substring(...)) — code points —
      // diverged on multibyte text.
      Some(s"""SELECT doc_id,
              |  CAST(64 + (${byteSql("hx", "1")} % 128) AS BIGINT) AS width,
              |  CAST(64 + (${byteSql("hx", "2")} % 128) AS BIGINT) AS height,
              |  ${Exact.roundNSql(
                 s"CASE WHEN n = 0 THEN 0.0 ELSE list_sum(list_transform(range(1, n + 1), i -> ${byteSql("hx", "i")})) * 1.0 / n END", 4)} AS mean_luma
              |FROM (SELECT doc_id, hex(text) AS hx, strlen(text) AS n FROM documents) h
              |ORDER BY doc_id""".stripMargin)),

    // Frame sampling as a declared query: every 4th 16-byte frame of the
    // payload with its byte checksum. Byte-exact hex-pair replica
    // (round-10): frame boundaries are BYTE offsets, so the former
    // length()/ascii() code-point replica drifted on multibyte text.
    QueryDef(
      "multimodal_frame_sample",
      (s, d) =>
        sampleFrames(withPayload(Tables.documents(s, d)))
          .orderBy("doc_id", "frame_idx"),
      Some(s"""WITH h AS (
              |  SELECT doc_id, hex(text) AS hx, strlen(text) AS n FROM documents),
              |f AS (
              |  SELECT doc_id, hx, n,
              |    unnest(range(0, CAST(ceil(n / 16.0) AS BIGINT), 4)) AS frame_idx
              |  FROM h)
              |SELECT doc_id, frame_idx,
              |  CAST(list_sum(list_transform(
              |    range(frame_idx * 16 + 1, least(frame_idx * 16 + 16, n) + 1),
              |    i -> ${byteSql("hx", "i")})) AS BIGINT) AS checksum
              |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    // Content-addressed media dedup: group binary payloads by md5 digest —
    // the "same bytes, keep one" pass every media-ingest pipeline runs
    // before decode. Shuffles 16-byte digests, never payloads; the oracle
    // hashes the identical UTF-8 bytes via md5(text).
    QueryDef(
      "multimodal_dedup_content",
      (s, d) =>
        withPayload(Tables.documents(s, d))
          .groupBy(md5(col("payload")).as("content_key"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"),
            min(octet_length(col("payload"))).cast("long").as("n_bytes"))
          .select("doc_id", "content_key", "n_copies", "n_bytes")
          .orderBy("doc_id"),
      Some("""SELECT MIN(doc_id) AS doc_id, md5(text) AS content_key,
             |  COUNT(*) AS n_copies, CAST(MIN(strlen(text)) AS BIGINT) AS n_bytes
             |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin))
  )
}
