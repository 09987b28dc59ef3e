package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** Binary-column multimodal plumbing (north star): payload + metadata
  * struct + per-partition feature extraction with the stubbed decoder.
  */
class MultimodalSpec extends SparkSpec {

  test("payload round-trips text bytes and metadata counts them") {
    val df = Multimodal.withPayload(Tables.documents(spark, sf0001))
    val r = df.select(
      col("doc_id"),
      decode(col("payload"), "UTF-8").as("back"),
      col("text"), col("media_meta.n_bytes"), length(col("text")))
      .filter(col("back") =!= col("text"))
    assert(r.count() === 0)
    val m = df.select((col("media_meta.n_bytes") === octet_length(col("payload"))).as("ok"))
      .filter(!col("ok"))
    assert(m.count() === 0)
  }

  test("mapPartitions extractor matches the per-row decoder") {
    val withP = Multimodal.withPayload(Tables.documents(spark, sf0001)).limit(50)
    val got = Multimodal.extractFeatures(withP)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    val expected = withP.select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> Multimodal.FakeDecoder.decode(r.getAs[Array[Byte]](1))).toMap
    assert(got === expected)
  }

  test("decoder plumbing survives degenerate payloads (empty, 1-byte, multibyte UTF-8)") {
    // A 100 TB media corpus contains zero-length blobs and payloads whose
    // byte length differs from its character count. The partition-wise
    // extractor and the frame sampler must agree with a driver-side decode
    // of the same UTF-8 bytes on exactly those shapes.
    import spark.implicits._
    val docs = Seq(
      (0L, "", "en"), (1L, "a", "en"), (2L, "汉字テスト", "zh"),
      (3L, "x" * 1000, "en"), (4L, "ab cd", "de"))
      .toDF("doc_id", "text", "lang")
    val withP = Multimodal.withPayload(docs)
    val got = Multimodal.extractFeatures(withP)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    val bytes = Seq(0L -> "", 1L -> "a",
      2L -> "汉字テスト", 3L -> "x" * 1000, 4L -> "ab cd")
      .map { case (id, t) => id -> t.getBytes("UTF-8") }.toMap
    assert(got === bytes.map { case (id, b) => id -> Multimodal.FakeDecoder.decode(b) })

    val frames = Multimodal.sampleFrames(withP)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    val expFrames = bytes.toSeq.flatMap { case (id, p) =>
      val nFrames = (p.length + 15) / 16
      (0 until nFrames by 4).map { f =>
        val slice = p.slice(f * 16, f * 16 + 16)
        (id, f.toLong, slice.map(b => (b & 0xff).toLong).sum)
      }
    }.sortBy(t => (t._1, t._2))
    assert(frames === expFrames)
    assert(!frames.exists(_._1 == 0L), "empty payload must produce no frames")
    assert(frames.count(_._1 == 3L) > 1, "long payload must produce strided frames")
  }

  test("stateful streaming running totals equal batch aggregates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingHarness
    import graft.streaming.StreamingHarness.Ev
    implicit val sq = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200).collect()
      .map(r => Ev(r.getLong(0), r.getAs[java.sql.Timestamp](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val stream = MemoryStream[Ev]
    val q = StreamingHarness.runningTotals(stream.toDS())
      .writeStream.format("memory").queryName("running_out").outputMode("update").start()
    val (a, b) = rows.splitAt(100)
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    // last update per user = final state
    val finals = spark.table("running_out")
      .groupBy("user_id").agg(max(col("n_events")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    val batch = rows.groupBy(_.user_id).map { case (u, es) => u -> es.length.toLong }
    assert(finals === batch)
  }
}
