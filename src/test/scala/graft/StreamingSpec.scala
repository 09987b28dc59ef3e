package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingHarness
import graft.streaming.StreamingHarness.Ev

/** Structured Streaming capability harness (SURVEY §5.5): streams the
  * sf0.001 events through MemoryStream and asserts the streaming aggregates
  * equal the identical transform applied in batch — Spark compiles both
  * through the same logical plan, so any divergence is a real bug.
  */
class StreamingSpec extends SparkSpec {

  private lazy val batchEvents = {
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(300)
  }

  private def streamed(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String,
      source: org.apache.spark.sql.DataFrame = null): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Option(source).getOrElse(batchEvents).collect().map(r => Ev(
      r.getLong(0), r.getAs[Timestamp](1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val stream = MemoryStream[Ev]
    // two chunks → two micro-batches, exercising incremental state merge
    val (a, b) = rows.splitAt(rows.length / 2)
    val q = transform(stream.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    val out = spark.table(name).collect()
    q.stop()
    out
  }

  private def sortedSeq(rs: Array[org.apache.spark.sql.Row]) =
    rs.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  test("streaming tumbling aggregate equals its batch twin") {
    val streaming = streamed(StreamingHarness.tumbling, "tumbling_out")
    val batch = StreamingHarness.tumbling(batchEvents).collect()
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("streaming session windows equal their batch twin") {
    val streaming = streamed(df => StreamingHarness.sessions(df), "sessions_out")
    val batch = StreamingHarness.sessions(batchEvents).collect()
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("ties fixture replays through streaming session windows with batch parity") {
    // VERDICT r12 #7: the seven adversarial sets sweep the 204 declared
    // queries; this harness never saw them. The ties set is the
    // adversarial one for session_window state merge: 16 of 20 events
    // share ONE instant (zero-gap merges, a fully-duplicated row pair,
    // one single-event user), with a 1-day return and a stray — and its
    // events.ts is BIGINT epoch-nanos, so the replay also rides the
    // loader's LongType branch. The micro-batch split lands same-instant
    // events in BOTH batches, forcing a cross-batch merge of sessions
    // that start at identical timestamps.
    val dir = java.nio.file.Files.createTempDirectory("graft_ties_stream").toString
    DegenTables.writeTies(spark, dir)
    val tiesEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
    val streaming = streamed(df => StreamingHarness.sessions(df), "ties_sessions_out", tiesEvents)
    val batch = StreamingHarness.sessions(tiesEvents).collect()
    assert(batch.length >= 3, "ties fixture lost its multi-user session shape")
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("ties fixture replays through streaming tumbling windows with batch parity") {
    // Companion to the session-window ties replay: tumbling's hazard on
    // this fixture is the cross-batch MERGE of one (window, event_type)
    // group fed from both micro-batches at a single instant, with tied
    // values inside the money-typed sum. (The interval join is NOT
    // replayed on ties — the fixture has no signup events, so that
    // parity would be vacuously empty.)
    val dir = java.nio.file.Files.createTempDirectory("graft_ties_tumb").toString
    DegenTables.writeTies(spark, dir)
    val tiesEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
    val streaming = streamed(StreamingHarness.tumbling, "ties_tumbling_out", tiesEvents)
    val batch = StreamingHarness.tumbling(tiesEvents).collect()
    assert(batch.nonEmpty, "ties fixture produced no tumbling windows")
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("stream-stream interval join equals its batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = batchEvents.collect().map(r => Ev(
      r.getLong(0), r.getAs[Timestamp](1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val stream = MemoryStream[Ev]
    // stream-stream joins emit in append mode only (no complete mode);
    // the generous delay keeps replay chunking from evicting join state
    // that the batch twin retains.
    val q = StreamingHarness.purchaseSignupJoin(stream.toDF(), "30 days")
      .writeStream.format("memory").queryName("ssjoin_out").outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    val streaming = spark.table("ssjoin_out").collect()
    q.stop()
    val batch = StreamingHarness.purchaseSignupJoin(batchEvents).collect()
    assert(batch.nonEmpty, "batch twin produced no joined rows — fixture too small")
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("streaming dedup keeps one row per (user_id, event_type)") {
    val streaming = streamed(
      df => StreamingHarness.dedup(df).groupBy("user_id", "event_type").count(),
      "dedup_out")
    val batchKeys = batchEvents.select("user_id", "event_type").distinct().count()
    assert(streaming.length.toLong === batchKeys)
    assert(streaming.forall(_.getLong(2) === 1L))
  }

  test("constant fixture replays through streaming dedup with batch parity") {
    // Round-14 companion to the ties replays: the constant set is the
    // adversarial input for DEDUP state — every event is bit-identical in
    // every non-key column (one type, one value), so the only thing
    // distinguishing rows is the dedup key itself, and the micro-batch
    // split delivers the SAME (user_id, event_type) key from both batches
    // with indistinguishable payloads. Cross-batch state must suppress
    // the re-arrivals; with a single event_type the surviving set is
    // exactly one row per user. events.ts is BIGINT epoch-nanos, so the
    // replay also rides the loader's LongType branch.
    val dir = java.nio.file.Files.createTempDirectory("graft_const_dedup").toString
    DegenTables.writeConstant(spark, dir)
    val constEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
    val streaming = streamed(
      df => StreamingHarness.dedup(df).groupBy("user_id", "event_type").count(),
      "const_dedup_out", constEvents)
    val users = constEvents.select("user_id").distinct().count()
    assert(users >= 3, "constant fixture lost its multi-user shape")
    assert(streaming.length.toLong === users,
      "dedup must keep exactly one row per (user, the single type)")
    assert(streaming.forall(_.getLong(2) === 1L))
  }

  test("calendar fixture replays through streaming tumbling windows with batch parity") {
    // Round-14 companion to the ties/constant replays: the calendar set
    // is the adversarial input for WINDOW STATE KEYS — its events sit at
    // pre-1970 instants (negative epoch micros, including one NOT
    // hour-aligned: the window()-modular-arithmetic probe), the exact
    // epoch zero, and a 23:59:59/00:00:00 rollover across the 1996
    // leap-day month end. The streaming runtime keys its state store on
    // the window struct, so negative window starts must hash, merge
    // across micro-batches, and emit identically to the batch plan.
    // events.ts is BIGINT epoch-nanos, riding the loader's LongType
    // branch at negative values.
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_tumb").toString
    DegenTables.writeCalendar(spark, dir)
    val calEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
    val streaming = streamed(StreamingHarness.tumbling, "cal_tumbling_out", calEvents)
    val batch = StreamingHarness.tumbling(calEvents).collect()
    assert(batch.exists(_.getAs[Timestamp]("window_start").getTime < 0L),
      "calendar fixture lost its pre-1970 window — negative state keys unexercised")
    assert(sortedSeq(streaming) === sortedSeq(batch))
  }

  test("calendar fixture replays through streaming session windows with batch parity") {
    // Session-window companion: the calendar set's u1 run carries gaps of
    // EXACTLY the 30-minute session gap at negative event times — the
    // merge-boundary case (windows [t, t+gap) that touch without
    // overlapping) — plus a session crossing the epoch itself and the
    // adjacent-second midnight rollover into March 1996. The stateful
    // cross-batch merge must resolve every touch/overlap decision the
    // same way the batch plan does, at instants a naive modular or
    // truncating implementation mishandles.
    //
    // FOUND ON FIRST RUN, now pinned as the documented divergence: the
    // streaming runtime's watermark starts at EPOCH ZERO and never goes
    // negative, and the session-window plan filters input rows whose
    // session would close at-or-before the watermark — so u1's
    // [22:00, 23:30) session, which CLOSES pre-epoch, is structurally
    // absent from streaming output under ANY delay (verified: identical
    // loss at 10 minutes and at 12000 days), while the watermark-free
    // batch twin keeps it. A session merely STARTING pre-epoch but
    // closing after (u1's 23:59:59 → 01:30 run) survives, so negative
    // session state keys are still exercised. The spanning delay below
    // removes the one OTHER dropper (chunked-replay eviction), making
    // the epoch floor the single expected difference.
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_sess").toString
    DegenTables.writeCalendar(spark, dir)
    val calEvents = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
    val streaming = streamed(df => StreamingHarness.sessions(df, "12000 days"),
      "cal_sessions_out", calEvents)
    val batch = StreamingHarness.sessions(calEvents, "12000 days").collect()
    val (preEpochClosed, streamReachable) = batch.partition(
      _.getAs[Timestamp]("session_end").getTime <= 0L)
    assert(preEpochClosed.nonEmpty,
      "calendar fixture lost its pre-epoch-closing session — the " +
        "watermark-floor divergence is unexercised")
    assert(streamReachable.exists(_.getAs[Timestamp]("session_start").getTime < 0L),
      "calendar fixture lost its epoch-crossing session — negative " +
        "session state keys unexercised")
    assert(sortedSeq(streaming) === sortedSeq(streamReachable),
      "streaming must equal batch minus exactly the pre-epoch-closing sessions")
  }

  test("update output mode re-emits only changed aggregate keys per micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, user: Long) = Ev(id, base, user, "click", 1.0)
    val q = stream.toDF().groupBy("user_id").count()
      .writeStream.format("memory").queryName("upd_out").outputMode("update").start()
    stream.addData(ev(1, 10), ev(2, 10), ev(3, 20)); q.processAllAvailable()
    val afterB1 = spark.table("upd_out").collect()
    // batch 1: both keys emitted once
    assert(afterB1.length === 2)
    stream.addData(ev(4, 20)); q.processAllAvailable()
    val afterB2 = spark.table("upd_out").collect()
    q.stop()
    // batch 2 touched ONLY user 20 → exactly one more row, and the latest
    // row for user 20 carries the updated count while user 10's stands
    assert(afterB2.length === 3, "update mode must emit only the changed key")
    val latest = afterB2.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getLong(1)).max }
    assert(latest === Map(10L -> 2L, 20L -> 2L))
  }

  test("Trigger.AvailableNow drains newly arrived files exactly once per run") {
    // The scheduled-incremental production shape: each run processes files
    // that arrived since the last checkpoint, then exits — re-runs without
    // new data are no-ops, new files are consumed exactly once.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_avnow_ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_avnow_out").toString
    def runOnce(): Long = {
      // file sink: the durable-output shape that supports checkpoint resume
      // (the in-memory sink can't recover a checkpoint by design)
      val q = spark.readStream.schema("id BIGINT, v STRING").parquet(dir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()
      spark.read.parquet(outDir).count()
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    assert(runOnce() === 2)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(dir)
    assert(runOnce() === 3, "second run must add only the new file's rows")
    assert(runOnce() === 3, "run with no new files must be a no-op")
  }

  test("dropDuplicatesWithinWatermark suppresses exact re-delivery of a batch") {
    // The at-least-once ingestion shape: the same chunk delivered twice
    // (e.g. a source retry) must not duplicate downstream rows, and state
    // is bounded by the watermark rather than growing forever like plain
    // dropDuplicates — this is the API's reason to exist (Spark 3.5+).
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = batchEvents.collect().take(100).map(r => Ev(
      r.getLong(0), r.getAs[Timestamp](1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val stream = MemoryStream[Ev]
    val q = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("ddww_out").outputMode("append").start()
    stream.addData(rows.toIndexedSeq); q.processAllAvailable()
    stream.addData(rows.toIndexedSeq); q.processAllAvailable() // redelivery
    val out = spark.table("ddww_out").collect()
    q.stop()
    assert(out.length === rows.length, "re-delivered rows were not suppressed")
    assert(out.map(_.getLong(0)).toSet === rows.map(_.event_id).toSet)
  }

  test("dup-key JSON normalization works at the stream edge (native expression in a streaming plan)") {
    // Ingest normalization happens where data ARRIVES — a live stream.
    // The native MapDedupKeysFirstWins is row-local so Structured
    // Streaming should accept it in a streaming projection (no
    // unsupported-operation check applies), but only a pin proves a
    // custom expression never trips the streaming analyzer; and the
    // dup-key rows must be map_concat-safe downstream IN the stream,
    // first-wins intact (round 15, closing the JsonNormalize loop at the
    // edge the fn_map QueryDef note points to).
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("id", "props")
      .withColumn("m", graft.functions.JsonNormalize.fromJsonFirstWins(col("props")))
      .withColumn("mm", when(col("m").isNotNull,
        map_concat(col("m"), map(lit("src"), lit("stream"))))
        .otherwise(map(lit("src"), lit("stream"))))
      .select(col("id"), expr("try_element_at(mm, 'k')").as("k"),
        expr("try_element_at(mm, 'src')").as("src"))
      .writeStream.format("memory").queryName("dupkey_stream").outputMode("append").start()
    stream.addData(Seq(
      (0L, """{"k": 1}"""),
      (1L, """{"k": 7, "k": 8}"""),
      (2L, "not json at all")))
    q.processAllAvailable()
    stream.addData(Seq((3L, """{"q": 1, "q": 2, "k": 9}""")))
    q.processAllAvailable()
    val out = spark.table("dupkey_stream").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    q.stop()
    assert(out(0L) === (("1", "stream")))
    assert(out(1L) === (("7", "stream")), "first-wins violated in the stream")
    assert(out(2L) === ((null, "stream")), "malformed row must NULL-normalize, not kill the query")
    assert(out(3L) === (("9", "stream")))
  }
}
