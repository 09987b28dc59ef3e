package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The document-frequency guard shared by the inverted-index dedup family
  * (VERDICT r03 #4, ADVICE r04): dropping (lang, source, key) posting lists
  * longer than the bound BEFORE the pair join bounds the worst-case k² blow-
  * up. Two properties make the guard safe to declare as part of the query
  * semantics:
  *  1. no-op whenever the bound ≥ the corpus' max within-block df (so the
  *     fixture oracles are unchanged by wiring it in), and
  *  2. when it DOES engage, per-doc sizes are POST-guard — the Jaccard
  *     denominator counts surviving tokens only, exactly as the oracles'
  *     sz-over-guarded-dt CTE computes it.
  */
class DedupGuardSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "source", "text")
  }

  test("fixture max within-block df is far below DfBound (guard is a no-op there)") {
    val maxDf = Tables.documents(spark, sf0001)
      .select(col("lang"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("lang", "source", "tok").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDf < Dedup.DfBound,
      s"fixture max df $maxDf reached the bound ${Dedup.DfBound}; " +
        "the no-op claim in Dedup's scaladoc no longer holds")
  }

  test("guarded pair set equals unguarded on the fixture corpus") {
    val d = Tables.documents(spark, sf0001)
    val guarded = Dedup.tokenPairs(d)
    val unguarded = Dedup.tokenPairs(d, bound = Long.MaxValue)
    assert(guarded.exceptAll(unguarded).isEmpty &&
      unguarded.exceptAll(guarded).isEmpty,
      "DfBound changed the fixture pair set — oracles would now disagree")
  }

  test("pair set is invariant for any bound >= corpus max df (random corpora)") {
    // Distinct tokens per doc mean within-block df <= #docs, so bound =
    // #docs always dominates the max df; ScalaCheck drives the corpora.
    val corpusGen = Gen.listOfN(6,
      Gen.zip(Gen.oneOf("en", "fr"), Gen.listOfN(5, Gen.oneOf("a", "b", "c", "d", "e"))))
    (0 until 5).foreach { i =>
      val rows = corpusGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case ((lang, toks), id) =>
          (id.toLong, lang, "web", toks.mkString(" "))
        }
      val df = docs(rows)
      val bounded = Dedup.tokenPairs(df, bound = rows.size.toLong).collect().toSet
      val unbounded = Dedup.tokenPairs(df, bound = Long.MaxValue).collect().toSet
      assert(bounded === unbounded, s"seed $i: bound=#docs changed the pair set")
    }
  }

  test("guard engages on a hot token and sizes are post-guard") {
    // "hot" has df 3 > bound 2 inside the single (en, web) block and is
    // dropped; alpha/beta (df 2) and gamma (df 1) survive. Post-guard doc 1
    // and 2 are {alpha, beta}, doc 3 is {gamma}:
    //  - the only surviving pair is (1,2) with i=2 and na=nb=2 — the sizes
    //    prove the denominator counts SURVIVING tokens, not original ones
    //    (pre-guard sizes would read na=nb=3 and sim 2/4);
    //  - pairs (1,3)/(2,3) existed only through "hot" and must vanish.
    val df = docs(Seq(
      (1L, "en", "web", "hot alpha beta"),
      (2L, "en", "web", "hot alpha beta"),
      (3L, "en", "web", "hot gamma")))
    val guarded = Dedup.tokenPairs(df, bound = 2L)
      .select("da", "db", "i", "na", "nb", "sim_raw").collect()
    assert(guarded.length === 1, s"expected exactly one surviving pair, got ${guarded.toSeq}")
    val r = guarded.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5)) === ((1L, 2L, 2L, 2L, 2L, 1.0d)))
    val unguarded = Dedup.tokenPairs(df, bound = 3L).collect()
    assert(unguarded.length === 3,
      "bound=3 must keep the hot token and produce all three pairs")
  }

  test("reliable-checkpoint switch produces identical results to localCheckpoint") {
    // VERDICT r05 #1: with spark.graft.reliableCheckpointDir set, every
    // materialize() in the dedup shapes uses a reliable checkpoint()
    // (survives executor loss at cluster scale) instead of localCheckpoint.
    // The switch must be a pure fault-tolerance change: tokenPairs and
    // connectedComponents results are bit-identical on both paths.
    import spark.implicits._
    val d = Tables.documents(spark, sf0001)
    val localPairs = Dedup.tokenPairs(d).collect().toSet
    val edges = {
      val p = (0L until 10L).map(i => (i, i + 1)) ++ Seq((50L, 51L))
      val df = p.toDF("da", "db")
      df.union(df.select(col("db").as("da"), col("da").as("db")))
    }
    val localCC = Dedup.connectedComponents(edges).collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try {
      val reliablePairs = Dedup.tokenPairs(d).collect().toSet
      val reliableCC = Dedup.connectedComponents(edges).collect().toSet
      assert(reliablePairs === localPairs,
        "reliable checkpoint changed the tokenPairs result")
      assert(reliableCC === localCC,
        "reliable checkpoint changed the connectedComponents result")
      // The switch must actually write checkpoint data under the dir —
      // otherwise this test would pass with the flag silently ignored.
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(wrote > 0, s"no checkpoint files under $dir — the flag was ignored")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpointDir")
    }
  }

  // VERDICT r06 #4: the parity test above proves the reliable switch writes
  // checkpoint files; these two prove the materialization is actually
  // CONSUMED — a later action on the materialized frame reads the
  // checkpointed blocks instead of re-executing the upstream. The probe is
  // an accumulator bumped once per upstream row evaluation: if materialize()
  // ever degrades to identity (e.g. the lazy eager=false call stops
  // checkpointing), the second action recomputes the upstream and the
  // accumulator moves — red. The first action MAY legitimately run the
  // upstream more than once (reliable checkpoint() re-executes the RDD in a
  // separate job to write the files); only the post-materialization delta
  // must be zero.
  private def assertMaterializeConsumed(label: String): Unit = {
    val acc = spark.sparkContext.longAccumulator(s"graft-probe-$label")
    val probe = udf { (x: Long) => acc.add(1L); x }.asNondeterministic()
    val base = spark.range(0, 1000, 1, 4).toDF("id")
      .withColumn("probed", probe(col("id")))
    val mat = Dedup.materialize(base)
    // Lazy contract (ADVICE r05): constructing the frame runs no jobs.
    assert(acc.value === 0L,
      s"$label: materialize() triggered upstream execution at construction time")
    // The materialized plan must be a scan of the checkpointed RDD, not the
    // original tree — fails if materialize() becomes a pass-through.
    assert(mat.queryExecution.logical.getClass.getSimpleName === "LogicalRDD",
      s"$label: materialize() no longer swaps the plan for an RDD scan: " +
        mat.queryExecution.logical.getClass.getName)
    def consume(): Long = mat.agg(sum("probed")).head().getLong(0)
    val expected = 1000L * 999L / 2L
    assert(consume() === expected)
    val afterFirst = acc.value
    assert(afterFirst >= 1000L, s"$label: upstream probe never ran ($afterFirst)")
    assert(consume() === expected)
    assert(acc.value === afterFirst,
      s"$label: second action re-executed the upstream " +
        s"(${acc.value - afterFirst} extra row evaluations) — " +
        "the checkpoint is written but not consumed")
  }

  test("localCheckpoint materialization is consumed on re-use (no upstream re-execution)") {
    assertMaterializeConsumed("local")
  }

  test("materialize resolution order: reliable dir when configured, else DISK-ONLY local blocks") {
    // VERDICT r18 #2: the ×256 probes showed the MEMORY-first default
    // localCheckpoint level deterministically OOMs when checkpoint storage
    // competes with execution in one JVM — survival depended on the
    // SPARK_GRAFT_RELIABLE_CHECKPOINT knob being set. The scale-safe path
    // must be the DEFAULT: without a reliable dir, materialize() must
    // persist its local-checkpoint blocks at a level that uses disk and
    // NEVER memory, so checkpoint storage cannot compete with execution
    // memory (a 100 TB deployment that forgets the knob inherits safety,
    // not the footgun).
    def newlyPersistedLevels(f: => Unit): Seq[org.apache.spark.storage.StorageLevel] = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f
      spark.sparkContext.getPersistentRDDs.collect {
        case (id, rdd) if !before.contains(id) => rdd.getStorageLevel
      }.toSeq
    }
    assert(!spark.conf.getOption("spark.graft.reliableCheckpointDir").exists(_.nonEmpty),
      "precondition: no reliable dir configured")
    // materialize() also honors the env knob; when it's set the "local
    // DISK_ONLY" half below would silently exercise the reliable path and
    // fail with a misleading "persisted no RDD blocks". Cancel instead.
    assume(!sys.env.get("SPARK_GRAFT_RELIABLE_CHECKPOINT").exists(_.nonEmpty),
      "SPARK_GRAFT_RELIABLE_CHECKPOINT is set in this environment — the " +
        "local-path half of this test cannot run")
    val local = newlyPersistedLevels {
      Dedup.materialize(spark.range(0, 1000, 1, 4).toDF("id")).count()
    }
    assert(local.nonEmpty, "local materialize persisted no RDD blocks")
    local.foreach { lvl =>
      assert(lvl.useDisk && !lvl.useMemory,
        s"local checkpoint blocks persisted at $lvl — memory-first storage " +
          "competes with execution (the ×256 OOM class); expected disk-only")
    }
    // With a reliable dir configured the local persist path must NOT be
    // used at all — blocks go to the fault-tolerant dir instead.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-order").toString
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try {
      val reliable = newlyPersistedLevels {
        Dedup.materialize(spark.range(0, 1000, 1, 4).toDF("id")).count()
      }
      assert(reliable.isEmpty,
        s"reliable path still persisted local blocks: $reliable")
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset("spark.graft.reliableCheckpointDir")
  }

  test("reliable checkpoint materialization is consumed on re-use (no upstream re-execution)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-consume").toString
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try assertMaterializeConsumed("reliable")
    finally spark.conf.unset("spark.graft.reliableCheckpointDir")
  }

  test("guard drops only lists strictly above the bound (boundary inclusive)") {
    // df == bound survives (<=), df == bound+1 is dropped — pins the
    // comparison direction so the oracle QUALIFY (<=) can't drift.
    val df = docs(Seq(
      (1L, "en", "web", "x common"),
      (2L, "en", "web", "y common"),
      (3L, "en", "web", "z common")))
    // "common" df=3: bound=3 keeps it (pairs exist), bound=2 drops it (none)
    assert(Dedup.tokenPairs(df, bound = 3L).count() === 3L)
    assert(Dedup.tokenPairs(df, bound = 2L).count() === 0L)
  }
}
