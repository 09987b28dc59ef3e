package graft

import java.nio.file.Files

/** Differential fuzz for the set-operator family (round-8 depth):
  * `set_except_all` / `set_intersect_all` carry BAG semantics (per-key
  * multiplicity arithmetic: max(cA−cB, 0) and min(cA, cB)), the DISTINCT
  * variants and `set_symmetric_diff` carry set semantics, and all of them
  * treat NULL keys as EQUAL (null-safe grouping) — none of which the
  * fixture corpus (non-null keys, near-uniform counts) seriously probes.
  * Drive the registered query bodies over a constructed orders table
  * against plain Scala multiset references. Planted seams:
  *
  *  - keys with unequal non-zero counts on both sides (partial except_all
  *    survival: exactly cA−cB copies must remain);
  *  - keys with EQUAL non-zero counts (except_all must drop them
  *    entirely; intersect_all must keep all copies);
  *  - keys on one side only; a NULL key on BOTH sides (must intersect);
  *  - rows in a third status 'P' (invisible to the F/O filters);
  *  - 'F'-status rows that are also '1-URGENT' (they enter BOTH legs of
  *    the union queries, so union_all must double-count them and
  *    union_distinct must not).
  */
class MultisetFuzzSpec extends SparkSpec {

  /** (o_custkey, o_orderstatus, o_orderpriority) */
  private type Order = (Option[Long], String, String)

  private def gen(seed: Long): Seq[Order] = {
    val rnd = new scala.util.Random(seed)
    val rows = scala.collection.mutable.ArrayBuffer[Order]()
    def add(k: Option[Long], st: String, n: Int): Unit =
      (0 until n).foreach { _ =>
        val prio = if (rnd.nextInt(3) == 0) "1-URGENT" else "3-MEDIUM"
        rows += ((k, st, prio))
      }
    // Engineered seam keys.
    add(Some(1L), "F", 3); add(Some(1L), "O", 1) // unequal both-sides
    add(Some(2L), "F", 2); add(Some(2L), "O", 2) // equal both-sides
    add(Some(3L), "F", 2) // F-only
    add(Some(4L), "O", 3) // O-only
    add(None, "F", 2); add(None, "O", 1) // NULL key on both sides
    add(Some(5L), "P", 4) // invisible status
    // Random bulk.
    for (k <- 6L to 20L) {
      add(Some(k), "F", rnd.nextInt(4))
      add(Some(k), "O", rnd.nextInt(4))
      add(Some(k), "P", rnd.nextInt(2))
    }
    // Planted for the TEETH flips: a key with MORE O- than F-copies —
    // the partial-survival direction set_except_all actually computes
    // (O EXCEPT ALL F), which the other engineered keys don't guarantee.
    add(Some(21L), "O", 3); add(Some(21L), "F", 1)
    rnd.shuffle(rows.toSeq)
  }

  private def counts(rows: Seq[Order], st: String): Map[Option[Long], Int] =
    rows.filter(_._2 == st).groupBy(_._1).map { case (k, g) => k -> g.size }

  private def assertSeams(rows: Seq[Order]): Unit = {
    val f = counts(rows, "F"); val o = counts(rows, "O")
    assert(f.exists { case (k, c) => o.getOrElse(k, 0) > 0 && c > o(k) },
      "unequal both-sides key missing")
    assert(f.exists { case (k, c) => c > 0 && o.getOrElse(k, 0) == c },
      "equal-counts key missing")
    assert(f.keySet.diff(o.keySet).nonEmpty && o.keySet.diff(f.keySet).nonEmpty,
      "one-side-only keys missing")
    assert(f.contains(None) && o.contains(None), "NULL key must be on both sides")
    assert(o.exists { case (k, c) => f.getOrElse(k, 0) > 0 && c > f(k) },
      "partial-survival key (more O- than F-copies) missing")
    assert(rows.exists(_._2 == "P"), "invisible-status rows missing")
    assert(rows.exists(r => r._2 == "F" && r._3 == "1-URGENT"),
      "F-and-urgent union double-count seam missing")
    assert(rows.exists(r => r._2 != "F" && r._3 == "1-URGENT"),
      "urgent-outside-F rows missing")
  }

  private def write(rows: Seq[Order]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-multiset-fuzz-").toString
    rows.toDF("o_custkey", "o_orderstatus", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  // Ascending with NULLS FIRST, matching orderBy("o_custkey")'s default.
  private val keyOrd: Ordering[Option[Long]] = Ordering.by {
    case None => (0, 0L)
    case Some(v) => (1, v)
  }

  private def keysOf(name: String, dir: String): Seq[Option[Long]] =
    Registry.queries(name)(spark, dir).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq

  private def bag(m: Map[Option[Long], Int]): Seq[Option[Long]] =
    m.toSeq.flatMap { case (k, c) => Seq.fill(c)(k) }.sorted(keyOrd)

  for (seed <- Seq(3L, 467L)) {
    lazy val rows = gen(seed)
    lazy val dir = write(rows)
    lazy val f = counts(rows, "F")
    lazy val o = counts(rows, "O")
    lazy val urgent = rows.filter(_._3 == "1-URGENT").groupBy(_._1)
      .map { case (k, g) => k -> g.size }

    test(s"generator plants every declared seam (seed $seed)") {
      assertSeams(rows)
    }

    test(s"set_except_all / set_intersect_all match bag arithmetic (seed $seed)") {
      // Query takes O as the left side of EXCEPT ALL.
      val expExcept = bag(o.map { case (k, c) => k -> math.max(c - f.getOrElse(k, 0), 0) })
      val expIntersect = bag(f.map { case (k, c) => k -> math.min(c, o.getOrElse(k, 0)) })
      // TEETH (VERDICT r08 #5): collapsing bag to set semantics must
      // change both expected outputs — the planted partial-survival key
      // (O=3, F=1 → exactly 2 copies survive) and the equal-counts key
      // (min = 2 copies intersect) make the flips deterministic.
      val exceptAsSet = bag(o.map { case (k, c) =>
        k -> (if (f.getOrElse(k, 0) > 0) 0 else c) })
      val intersectOneCopy = bag(f.map { case (k, c) =>
        k -> math.min(1, math.min(c, o.getOrElse(k, 0))) })
      assert(expExcept != exceptAsSet,
        "bag→set except flip invisible — no partial-survival key")
      assert(expIntersect != intersectOneCopy,
        "bag→set intersect flip invisible — no multi-copy intersection key")
      assert(keysOf("set_except_all", dir) === expExcept)
      assert(keysOf("set_intersect_all", dir) === expIntersect)
    }

    test(s"distinct set ops and symmetric diff match set arithmetic (seed $seed)") {
      val expExcept = o.keySet.diff(f.keySet).toSeq.sorted(keyOrd)
      val expIntersect = f.keySet.intersect(o.keySet).toSeq.sorted(keyOrd)
      assert(keysOf("set_except", dir) === expExcept)
      assert(keysOf("set_intersect", dir) === expIntersect)

      val expSym = (o.keySet.diff(f.keySet).map(k => (k, "only_open")) ++
        f.keySet.diff(o.keySet).map(k => (k, "only_final"))).toSeq
        .sortBy(_._1)(keyOrd)
      val gotSym = Registry.queries("set_symmetric_diff")(spark, dir).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSeq
      assert(gotSym === expSym)
    }

    test(s"union_all double-counts the F-and-urgent overlap; union_distinct " +
      s"does not (seed $seed)") {
      val expAll = bag(
        (f.keySet ++ urgent.keySet).map(k =>
          k -> (f.getOrElse(k, 0) + urgent.getOrElse(k, 0))).toMap)
      val expDistinct = (f.keySet ++ urgent.keySet).toSeq.sorted(keyOrd)
      assert(keysOf("set_union_all", dir) === expAll)
      assert(keysOf("set_union_distinct", dir) === expDistinct)
    }
  }
}
