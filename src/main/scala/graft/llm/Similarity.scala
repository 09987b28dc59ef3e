package graft.llm

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.10 — similarity search over the `embeddings` table
  * (64-dim float vectors, FIXTURES.md).
  *
  * `sim_cosine_topk` is the exact baseline: broadcast the (tiny) query set
  * against all candidates — at 100 TB the candidate side stays partitioned
  * and only the query side replicates, so this scales with |candidates|,
  * not |candidates|². The dot product runs entirely in codegen'd
  * higher-order functions (`zip_with` + `aggregate`), in double precision
  * (D5: float arithmetic would diverge from the oracle).
  *
  * `sim_ann_lsh` is the scale path: deterministic random-hyperplane LSH —
  * candidates are compared only within their sign-bucket, turning the
  * all-pairs scan into a bucket-local join (approximate ⇒ no oracle).
  */
object Similarity {

  /** Double-precision cosine between two array<double> columns — a native
    * codegen'd Catalyst expression ([[graft.functions.CosineSimilarity]]).
    * Same left-to-right summation order as the higher-order-function
    * formulation and DuckDB's `list_cosine_similarity`, so oracle parity
    * is preserved while the hot loop stays in WholeStageCodegen.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** The interpreted higher-order-function twin, kept for the parity test
    * in LlmPropsSpec (proves the custom expression computes the same
    * doubles bit-for-bit).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    // same NULL contract as the native expression: mismatched dims or a
    // norm that is zero OR NaN are undefined, not a truncated dot / NaN.
    // The explicit isnan() is load-bearing: Spark SQL orders NaN GREATER
    // than every number (unlike Java), so `na > 0d` alone is TRUE for a
    // NaN norm and would leak NaN through — the native expression's Java
    // `!(nx > 0)` guard catches NaN for free, and this predicate keeps
    // the two paths on one contract (round-10 NaN unification, pinned in
    // VectorFuzzSpec)
    when(size(a) === size(b) &&
      !isnan(na) && !isnan(nb) && na > 0d && nb > 0d, dot / (na * nb))
  }

  /** IVF nprobe=1 top-5 per query (vec_id < 10): deterministic seed
    * centroids (vec_id < 8), nearest-centroid assignment, probe only the
    * query's own cell. Shared by `sim_ann_ivf` (output) and
    * `sim_ann_recall` (evaluation against the exact top-5).
    */
  /** Nearest-centroid assignment (seed centroids vec_id < 8, rounded
    * cosine, centroid-id tie-break): (vec_id, emb, cell). Shared by the
    * IVF probe and the k-means recompute step.
    */
  private def ivfAssigned(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
    // Top-1 as a PER-ROW argmax over a collected centroid array — no
    // window, no aggregate, no extra rows (round 21, VERDICT r20 #1).
    // The r20 shape exploded the corpus ×8 (cross join against the
    // 8-row centroid table) and then reduced back with a row_number
    // window whose per-task sort state grew with partition size (x4096
    // probe: peaks 151→177/201 MB per octave). Two reduction rewrites
    // were measured before landing here:
    //  - TopKNeighbors K=1 over groupBy(vec_id, emb): peaks flattened
    //    (1 MB constant) but ObjectHashAggregate falls back to
    //    SORT-BASED aggregation past 128 distinct keys
    //    (spark.sql.objectHashAggregate.sortBased.fallbackThreshold),
    //    and the assignment's group key is corpus-cardinality — the
    //    x4096 re-measure paid 92 GB spill and ~2× the window's wall.
    //  - THIS shape: the 8 centroids are one collect_list row
    //    (sort_array ⇒ cent_id-ascending iteration order), broadcast as
    //    a 1-row cross join, and each vector picks its cell inside an
    //    `aggregate()` lambda — an INTERPRETED higher-order function
    //    (CodegenFallback; the r21 doc oversold it as "codegen'd" —
    //    VERDICT r21 #4), but O(#centroids) FLOPs per row, zero row
    //    blowup, zero shuffle, zero sort, per-task state O(1).
    // Ordering contract mirrors the replaced window's
    // (csim DESC NULLS LAST, cent_id ASC) exactly: iterate centroids in
    // cent_id order and replace only when the candidate STRICTLY beats
    // the incumbent — `cs > best.cs` with Spark's NaN-greatest compare
    // (codegen nanSafeCompareDoubles: NaN beats finite, NaN-vs-NaN and
    // exact ties keep the earlier = smaller cent_id; a NULL cs never
    // wins, a non-NULL cs always beats a NULL incumbent). The NULL-cid
    // seed is replaced by the first centroid unconditionally. The
    // size>0 filter preserves the old empty-centroid-set semantics
    // (no centroids ⇒ no assigned rows — the cross join against an
    // EMPTY 8-row table emitted nothing; the 1-row empty-array version
    // would emit every vector). Value parity pinned by IvfParitySpec
    // (row-for-row vs the r20 window body) and the R21Probe
    // aggregate-vs-HOF differential (diff = 0); plan by PlanSpec.
    val centsArr = broadcast(cents
      .agg(sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents")))
    // Round 22 (VERDICT r21 #5) — a STATIC-unrolled argmax was built,
    // measured, and REJECTED; this HOF stays. The candidate replaced the
    // interpreted `aggregate()` loop with 8 codegen'd packed-long
    // columns + greatest() (p_i = s4_i·16 + (15−i)); STANDALONE it was
    // 40% faster on the assignment pass (R22Probe kmeansprof x1024:
    // 2.58-2.65 → 1.53-1.61 s, parity diff 0). COMPOSED into ivfTop5 it
    // regressed the full query ~25×: top5 at x1024 5.6-7.4 → 134-140 s;
    // sim_ann_ivf x2048/x4096 247/485 s vs r21's 17.3 s (R22Probe
    // ivfbisect; the aborted x4096 cells are quoted in
    // OPTIMIZATION_r22.md). Root cause, read from the physical plans:
    // the downstream cell===ccell equi-join infers isnotnull(cell), and
    // filter pushdown INLINES it through the projection into THIS
    // BroadcastNestedLoopJoin's condition (it references both join
    // sides — emb and cents — so it can sink no further); there the
    // unrolled 8-cosine tree is one enormous predicate whose per-pair
    // evaluation ran ~25× slower than this HOF's compact
    // isnotnull(aggregate(…).cid), which pays the same inference but
    // evaluates as a small interpreted loop. The HOF is NOT the hot
    // path at scale (the x4096 walls are join/decimal-bound — see the
    // kmeans breakdown in OPTIMIZATION_r22.md §6), and its scale
    // properties stand: zero shuffle, zero spill, O(1) per-task state.
    val best = aggregate(col("cents"),
      struct(lit(null).cast("long").as("cid"), lit(null).cast("double").as("cs")),
      (b, c) => {
        val cs = Exact.roundN(cosine(col("emb"), c("cent")), 4)
        when(b("cid").isNull ||
          (cs.isNotNull && (b("cs").isNull || cs > b("cs"))),
          struct(c("cent_id").as("cid"), cs.as("cs"))).otherwise(b)
      })
    e.crossJoin(centsArr)
      .filter(size(col("cents")) > 0)
      .select(col("vec_id"), col("emb"), best("cid").as("cell"))
  }

  private def ivfTop5(s: SparkSession, d: String): DataFrame = {
    val assigned = ivfAssigned(s, d)
    val q = broadcast(assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("cell")))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
      col("cell").as("ccell"))
    // Cell-local top-5 via the bounded TopKNeighbors aggregate — the
    // cosineTopK shape verbatim (round 21, VERDICT r20 #1): the previous
    // row_number window sorted each task's cell-join output (state ∝
    // partition size); the K-slot aggregate pushes rows map-side into
    // ≤|queries|×5 slots. Identical ordering contract (sim DESC NULLS
    // LAST, neighbor_id ASC — TopKNeighborsSpec's fuzzed comparator).
    val topk = graft.functions.TopKNeighbors.top5
    q.join(c, col("cell") === col("ccell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Exact.roundN(cosine(col("qe"), col("ce")), 4))
      .groupBy(col("query_id"), col("cell"))
      .agg(topk(col("sim").isNull, coalesce(col("sim"), lit(0.0d)),
        col("neighbor_id")).as("tk"))
      .select(col("query_id"), col("cell"), explode(col("tk.items")).as("it"))
      .select(col("query_id"), col("cell"), col("it.k").as("neighbor_id"),
        when(col("it.ns"), lit(null).cast("double")).otherwise(col("it.s")).as("sim"))
  }

  /** Exact top-k cosine neighbors (query side broadcast).
    *
    * Round 20 (VERDICT r19 #1): the per-query top-k is a bounded
    * [[graft.functions.TopKNeighbors]] aggregate, not a `row_number`
    * window. The window shape shuffled little (Partial WindowGroupLimit)
    * but SORTED every joined input partition first — per-task state ∝
    * partition size (41.9→83.9 MB across the x1024→x2048 embeddings
    * probe under the pinned 32-partition harness). The K-slot aggregate
    * pushes rows map-side into ≤|queries| × K slots — per-task state flat
    * in the corpus regardless of how deployment sizes partitions, no
    * sort, one tiny exchange of partial buffers keyed on query_id.
    * Ordering contract identical (sim DESC NULLS LAST, neighbor_id ASC —
    * see the aggregator doc); value parity vs the old window body pinned
    * by TopKNeighborsSpec, plan shape by PlanSpec.
    */
  private def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe")))
    val c = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"))
    // Shared module-level udaf (round 21, VERDICT r20 #3): a per-call
    // `udaf(new TopKNeighbors(k))` allocated a fresh aggregator whose
    // encoders re-resolved per invocation — the measured ~0.2-0.4 s
    // cold-plan constant on each consumer. K=5 is structural (ADVICE
    // r21 #1): every consumer shares the one top5 instance, so there is
    // no k parameter to mis-set at runtime.
    val topk = graft.functions.TopKNeighbors.top5
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Exact.roundN(cosine(col("qe"), col("ce")), 4))
      .groupBy(col("query_id"))
      .agg(topk(col("sim").isNull, coalesce(col("sim"), lit(0.0d)),
        col("neighbor_id")).as("tk"))
      .select(col("query_id"), explode(col("tk.items")).as("it"))
      .select(col("query_id"), col("it.k").as("neighbor_id"),
        when(col("it.ns"), lit(null).cast("double")).otherwise(col("it.s")).as("sim"))
  }

  private val topKOracle: String =
    s"""SELECT query_id, neighbor_id, sim FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${Exact.roundNSql(Exact.cosineSqlGuarded("CAST(q.embedding AS DOUBLE[])", "CAST(c.embedding AS DOUBLE[])"), 4)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${Exact.roundNSql(Exact.cosineSqlGuarded("CAST(q.embedding AS DOUBLE[])", "CAST(c.embedding AS DOUBLE[])"), 4)} DESC,
       |      c.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10) t
       |WHERE rn <= 5""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim_cosine_topk",
      (s, d) => cosineTopK(s, d)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id")),
      Some(s"$topKOracle ORDER BY query_id, sim DESC, neighbor_id")),

    // Majority label among the top-5 neighbors; ties → smaller label.
    QueryDef(
      "sim_knn_label",
      (s, d) => {
        val labels = Tables.embeddings(s, d)
          .select(col("vec_id").as("neighbor_id"), col("label"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("votes").desc, col("label"))
        cosineTopK(s, d)
          .join(labels, "neighbor_id")
          .groupBy(col("query_id"), col("label"))
          .agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("label").as("pred_label"), col("votes"))
          .orderBy("query_id")
      },
      Some(s"""SELECT query_id, pred_label, votes FROM (
              |  SELECT query_id, label AS pred_label, COUNT(*) AS votes,
              |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY COUNT(*) DESC, label) AS rn
              |  FROM ($topKOracle) top5
              |  JOIN embeddings e ON e.vec_id = top5.neighbor_id
              |  GROUP BY query_id, label) t
              |WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    // Per-label embedding norm statistics — the vector-column profiling op
    // (norm drift is the standard embedding-quality monitor). The per-row
    // sum of squares folds left-to-right exactly like DuckDB's list_sum;
    // the cross-row average goes through decimal (D5).
    QueryDef(
      "sim_norm_stats",
      (s, d) => {
        val v = col("embedding").cast("array<double>")
        val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
        Tables.embeddings(s, d)
          .select(col("label"), norm.as("norm"))
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n"),
            Exact.roundN(sum(col("norm").cast("decimal(18,8)")).cast("double") / count(lit(1)), 4)
              .as("avg_norm"),
            Exact.roundN(min(col("norm")), 4).as("min_norm"),
            Exact.roundN(max(col("norm")), 4).as("max_norm"))
          .orderBy("label")
      },
      Some(s"""SELECT label, COUNT(*) AS n,
              |  ${Exact.roundNSql("CAST(SUM(CAST(norm AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*)", 4)} AS avg_norm,
              |  ${Exact.roundNSql("MIN(norm)", 4)} AS min_norm,
              |  ${Exact.roundNSql("MAX(norm)", 4)} AS max_norm
              |FROM (SELECT label,
              |        SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
              |      FROM embeddings) t
              |GROUP BY label ORDER BY label""".stripMargin)),

    // Approximate NN via deterministic random-hyperplane LSH: 8 sign bits
    // from fixed LCG-generated hyperplanes → bucket; exact cosine only
    // within the bucket. Approximate recall ⇒ smoke-only (no oracle).
    QueryDef(
      "sim_ann_lsh",
      (s, d) => {
        val nBits = 8
        val dim = 64
        // Deterministic pseudo-random hyperplanes from the same LCG family
        // as udf_scalar: plane p, dim i → centered unit-scale double.
        val planes: Seq[Seq[Double]] = (0 until nBits).map { p =>
          (0 until dim).map { i =>
            val x = ((p.toLong * dim + i) * 1103515245L + 12345L) % 2147483648L
            x.toDouble / 2147483648.0 - 0.5
          }
        }
        val planeLits = array(planes.map(pl => array(pl.map(lit): _*)): _*)
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
          .withColumn("planes", planeLits)
          .withColumn("bucket",
            aggregate(
              transform(col("planes"), pl =>
                when(aggregate(zip_with(pl, col("emb"), (x, y) => x * y),
                  lit(0.0d), (acc, v) => acc + v) > 0, 1L).otherwise(0L)),
              lit(0L), (acc, b) => acc * 2 + b))
          .drop("planes")
        val q = broadcast(e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("bucket")))
        val c = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
          col("bucket").as("cbucket"))
        // Bucket-local top-5 via the bounded TopKNeighbors aggregate
        // (round 21, ADVICE r20 #2): the row_number window's sort state
        // grew with bucket skew — one hot sign-bucket reproduced the
        // partition-sort shape everywhere else rewrote. Same ordering
        // contract as the replaced window (sim DESC NULLS LAST,
        // neighbor_id ASC).
        val topk = graft.functions.TopKNeighbors.top5
        q.join(c, col("bucket") === col("cbucket") && col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", Exact.roundN(cosine(col("qe"), col("ce")), 4))
          .groupBy(col("query_id"))
          .agg(topk(col("sim").isNull, coalesce(col("sim"), lit(0.0d)),
            col("neighbor_id")).as("tk"))
          .select(col("query_id"), explode(col("tk.items")).as("it"))
          .select(col("query_id"), col("it.k").as("neighbor_id"),
            when(col("it.ns"), lit(null).cast("double")).otherwise(col("it.s")).as("sim"))
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      None),

    // Per-vector int8 min-max quantization — the storage-compression pass
    // an embedding pipeline runs before indexing. q_i = round(255·(x−mn)/
    // (mx−mn)) through Exact.roundN (plain round(double) differs between
    // engines); the checksum sum stays in exact integer arithmetic. Pure
    // per-row lambda work, no shuffle.
    //
    // The divisor is NULLIF-guarded (round 8): an all-equal vector has
    // mx−mn = 0 and under Spark 4's default ANSI mode a bare division
    // throws DIVIDE_BY_ZERO — ONE degenerate row would kill the whole
    // job at 100 TB. Declared semantics: a zero-dynamic-range vector
    // quantizes to NULL (mirrored in the oracle's NULLIF), the
    // bad-row-yields-null posture fn_try_arith documents. Pinned in
    // ClosedFormFuzzSpec.
    QueryDef(
      "sim_quantize_int8",
      (s, d) => {
        // Pre-project mn/range/q as NAMED columns instead of capturing
        // the array_min/array_max expression trees inside the transform
        // lambda: a captured expression is re-evaluated per ELEMENT
        // (64 × O(64) array scans per vector) and the un-named q was
        // projected three times (q_first/q_last/q_sum each rebuilt the
        // array) — a ~150× constant found by the round-17 universal
        // scaling sweep (104 s for 2M vectors at ×1024). CollapseProject
        // keeps non-cheap aliases that are consumed more than once, so
        // the lambda now references per-row attributes; the plan shape
        // is pinned by PlanSpec ("computes min/max once per row").
        // Arithmetic unchanged — oracle-identical output.
        val emb = col("embedding").cast("array<double>")
        Tables.embeddings(s, d)
          .select(col("vec_id"), emb.as("emb"),
            array_min(emb).as("mn"), array_max(emb).as("mx"))
          .select(col("vec_id"), col("emb"), col("mn"),
            when(col("mx") === col("mn"), lit(null).cast("double"))
              .otherwise(col("mx") - col("mn")).as("rng"))
          .select(col("vec_id"), transform(col("emb"), x =>
            Exact.roundN((x - col("mn")) / col("rng") * 255d, 0).cast("long")).as("q"))
          .select(
            col("vec_id"),
            // try_element_at: a malformed sub-64-dim vector would make
            // plain element_at(q, 64) an ANSI INVALID_ARRAY_INDEX
            // job-killer; DuckDB's q[64] out-of-bounds is already NULL
            try_element_at(col("q"), lit(1)).as("q_first"),
            try_element_at(col("q"), lit(64)).as("q_last"),
            aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"))
          .orderBy("vec_id")
      },
      Some(s"""SELECT vec_id, q[1] AS q_first, q[64] AS q_last,
              |  CAST(list_sum(q) AS BIGINT) AS q_sum
              |FROM (
              |  SELECT vec_id,
              |    list_transform(emb, x -> CAST(
              |      ${Exact.roundNSql("(x - mn) / NULLIF(mx - mn, 0) * 255", 0)} AS BIGINT)) AS q
              |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
              |          list_aggregate(CAST(embedding AS DOUBLE[]), 'min') AS mn,
              |          list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS mx
              |        FROM embeddings) b) t
              |ORDER BY vec_id""".stripMargin)),

    // Per-label mean embedding (class centroids — the k-means/classifier
    // prototype step). posexplode to (label, dim, value) rows, decimal
    // sums per cell (order-insensitive), flat (label, dim, centroid)
    // output. One shuffle keyed (label, dim): at 100 TB this is the
    // standard map-side-combinable centroid reduction.
    QueryDef(
      "sim_label_centroid",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("dim").cast("long").as("dim"))
          .agg(
            count(lit(1)).as("n"),
            Exact.roundN(
              sum(col("x").cast("decimal(28,10)")).cast("double") / count(lit(1)), 6)
              .as("centroid"))
          .filter(col("dim") < 8) // bounded output: first 8 dims per label
          .orderBy("label", "dim"),
      Some(s"""SELECT label, dim, COUNT(*) AS n,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)", 6)} AS centroid
              |FROM (
              |  SELECT label,
              |    unnest(range(0, len(embedding))) AS dim,
              |    unnest(CAST(embedding AS DOUBLE[])) AS x
              |  FROM embeddings) t
              |WHERE dim < 8
              |GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // IVF-bucketed ANN — the other classic scale path (inverted-file
    // index): deterministic seed centroids (vec_id < 8), every vector
    // assigned to its nearest centroid (rounded cosine, centroid-id
    // tie-break ⇒ fully deterministic ⇒ oracle-able, unlike the LSH
    // variant), then each query probes ONLY its own cell (nprobe=1).
    // Scale shape: centroids broadcast (assignment is map-side), cell
    // search is an equi-join on cell id — work ∝ cell population, never
    // all-pairs. At 100 TB the assignment pass is one broadcast-map and
    // the probe is a co-partitioned join on (cell).
    QueryDef(
      "sim_ann_ivf",
      (s, d) => ivfTop5(s, d)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id")),
      Some(s"""WITH e AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
              |cents AS (SELECT vec_id AS cent_id, emb AS cent FROM e WHERE vec_id < 8),
              |assigned AS (
              |  SELECT vec_id, emb, cell FROM (
              |    SELECT e.vec_id, e.emb, c.cent_id AS cell,
              |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              |        ${Exact.roundNSql(Exact.cosineSqlGuarded("e.emb", "c.cent"), 4)} DESC,
              |        c.cent_id) AS arn
              |    FROM e CROSS JOIN cents c) t
              |  WHERE arn = 1)
              |SELECT query_id, cell, neighbor_id, sim FROM (
              |  SELECT q.vec_id AS query_id, q.cell, c.vec_id AS neighbor_id,
              |    ${Exact.roundNSql(Exact.cosineSqlGuarded("q.emb", "c.emb"), 4)} AS sim,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |      ${Exact.roundNSql(Exact.cosineSqlGuarded("q.emb", "c.emb"), 4)} DESC,
              |      c.vec_id) AS rn
              |  FROM assigned q JOIN assigned c
              |    ON c.cell = q.cell AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 10) t
              |WHERE rn <= 5
              |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin)),

    // ANN quality harness: recall@5 of the IVF nprobe=1 candidates against
    // the exact cosine top-5 — the evaluation every approximate index needs
    // before it replaces the exact scan in production. LEFT join keeps
    // zero-recall queries in the output (dropping them would overstate
    // recall). Both sides are deterministic and rounded, so the metric is
    // oracle-backed, unlike typical ANN eval harnesses.
    QueryDef(
      "sim_ann_recall",
      (s, d) => {
        val exact = cosineTopK(s, d).select(col("query_id"), col("neighbor_id"))
        val approx = ivfTop5(s, d)
          .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
        exact.join(approx,
            col("query_id") === col("aq") && col("neighbor_id") === col("an"), "left")
          .groupBy(col("query_id"))
          .agg(count(col("an")).as("n_hit"))
          .select(col("query_id"), col("n_hit"),
            Exact.roundN(col("n_hit").cast("double") / 5d, 4).as("recall_at_5"))
          .orderBy("query_id")
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
              |cents AS (SELECT vec_id AS cent_id, emb AS cent FROM e WHERE vec_id < 8),
              |assigned AS (
              |  SELECT vec_id, emb, cell FROM (
              |    SELECT e.vec_id, e.emb, c.cent_id AS cell,
              |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              |        ${Exact.roundNSql(Exact.cosineSqlGuarded("e.emb", "c.cent"), 4)} DESC,
              |        c.cent_id) AS arn
              |    FROM e CROSS JOIN cents c) t
              |  WHERE arn = 1),
              |ivf AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |        ${Exact.roundNSql(Exact.cosineSqlGuarded("q.emb", "c.emb"), 4)} DESC,
              |        c.vec_id) AS rn
              |    FROM assigned q JOIN assigned c
              |      ON c.cell = q.cell AND c.vec_id <> q.vec_id
              |    WHERE q.vec_id < 10) t
              |  WHERE rn <= 5),
              |exact AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |        ${Exact.roundNSql(Exact.cosineSqlGuarded("q.emb", "c.emb"), 4)} DESC,
              |        c.vec_id) AS rn
              |    FROM e q JOIN e c ON c.vec_id <> q.vec_id
              |    WHERE q.vec_id < 10) t
              |  WHERE rn <= 5)
              |SELECT x.query_id, CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hit,
              |  ${Exact.roundNSql("CAST(COUNT(i.neighbor_id) AS DOUBLE) / 5", 4)} AS recall_at_5
              |FROM exact x LEFT JOIN ivf i
              |  ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
              |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin)),

    // One exact k-means iteration (assign → recompute): vectors assigned to
    // their nearest seed centroid, then per-(cell, dimension) means from
    // exact decimal sums — the distributed ML-training step, with the
    // map-side-combinable aggregate shape that makes Lloyd's algorithm
    // scale (per-dim partial sums, never per-cell vector collections).
    QueryDef(
      "sim_kmeans_step",
      (s, d) =>
        ivfAssigned(s, d)
          .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "x")))
          .groupBy(col("cell"), col("dim").cast("long").as("dim"))
          .agg(count(lit(1)).as("n"),
            Exact.roundN(sum(col("x").cast("decimal(28,10)")).cast("double") /
              count(lit(1)), 6).as("centroid"))
          .orderBy("cell", "dim"),
      Some(s"""WITH e AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
              |cents AS (SELECT vec_id AS cent_id, emb AS cent FROM e WHERE vec_id < 8),
              |assigned AS (
              |  SELECT vec_id, emb, cell FROM (
              |    SELECT e.vec_id, e.emb, c.cent_id AS cell,
              |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              |        ${Exact.roundNSql(Exact.cosineSqlGuarded("e.emb", "c.cent"), 4)} DESC,
              |        c.cent_id) AS arn
              |    FROM e CROSS JOIN cents c) t
              |  WHERE arn = 1),
              |dims AS (
              |  SELECT cell, unnest(range(0, len(emb))) AS dim, unnest(emb) AS x
              |  FROM assigned)
              |SELECT cell, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)", 6)} AS centroid
              |FROM dims GROUP BY cell, dim ORDER BY cell, dim""".stripMargin)),

    // The native graft_cosine expression exercised through PLAIN SQL — the
    // SparkSessionExtensions surface a SQL-only user sees. install() is
    // idempotent registry injection (the extensions-config path only works
    // at session build; a library handed a live session registers late).
    // Similarity of every vector (vec_id < 100) to vector 0, 4dp.
    QueryDef(
      "sim_cosine_sql",
      (s, d) => {
        graft.functions.GraftExtensions.install(s)
        Tables.embeddings(s, d).createOrReplaceTempView("graft_emb_sql")
        s.sql("""SELECT e.vec_id,
                |  CAST(ROUND(TRY_CAST(graft_cosine(CAST(e.embedding AS ARRAY<DOUBLE>), q.qe)
                |    AS DECIMAL(38,10)), 4) AS DOUBLE) AS sim
                |FROM graft_emb_sql e
                |CROSS JOIN (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qe
                |            FROM graft_emb_sql WHERE vec_id = 0) q
                |WHERE e.vec_id > 0 AND e.vec_id < 100
                |ORDER BY e.vec_id""".stripMargin)
      },
      Some(s"""SELECT e.vec_id,
              |  ${Exact.roundNSql(
                 Exact.cosineSqlGuarded("CAST(e.embedding AS DOUBLE[])", "q.qe"), 4)} AS sim
              |FROM embeddings e
              |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qe
              |            FROM embeddings WHERE vec_id = 0) q
              |WHERE e.vec_id > 0 AND e.vec_id < 100
              |ORDER BY e.vec_id""".stripMargin))
  )
}
