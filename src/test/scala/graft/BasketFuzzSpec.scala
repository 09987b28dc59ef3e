package graft

import java.nio.file.Files

/** Differential fuzz for the market-basket trio (round-8 depth):
  * `behavior_cooccurrence`, `behavior_lift`, `behavior_confidence` all
  * reduce events to DISTINCT (user, day, type) baskets and then count
  * within-basket pairs. The seams the fixture's dense stream hides:
  *
  *  - repeated same-type events inside one basket count ONCE (the
  *    distinct reduce) — a duplicate-heavy basket must not inflate
  *    support;
  *  - two events one second apart across MIDNIGHT land in different
  *    baskets (the day boundary is the basket key);
  *  - single-type baskets feed the singles denominator but produce no
  *    pair rows; a pair of types that never co-occur is ABSENT, not a
  *    zero row;
  *  - cooccurrence/lift emit each unordered pair once (a < b);
  *    confidence emits BOTH directions with per-antecedent denominators.
  *
  * The reference rebuilds baskets as Sets in plain Scala and replicates
  * the queries' 4-dp decimal rounding; compares are `===`.
  */
class BasketFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** (event_id, epochSec, user_id, event_type) */
  private type Ev = (Long, Long, Long, String)

  private def sec(d: String, hms: String): Long =
    java.time.LocalDateTime.parse(s"${d}T$hms")
      .toEpochSecond(java.time.ZoneOffset.UTC)

  private def corpus(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val rows = scala.collection.mutable.ArrayBuffer[Ev]()
    var id = 0L
    def add(u: Long, s: Long, et: String): Unit = { id += 1; rows += ((id, s, u, et)) }
    // u1: duplicate-heavy basket — 5× click + 1× view on one day.
    (1 to 5).foreach(i => add(1, sec("2024-03-04", f"08:0$i%01d:00"), "click"))
    add(1, sec("2024-03-04", "09:00:00"), "view")
    // u1 next day: midnight straddle — 23:59:59 "view" and +2s "purchase"
    // must be two different baskets (no view↔purchase pair from this).
    add(1, sec("2024-03-05", "23:59:59"), "view")
    add(1, sec("2024-03-06", "00:00:01"), "purchase")
    // u2: single-type basket (denominator only).
    add(2, sec("2024-03-04", "12:00:00"), "signup")
    // u2 and u3 share a day but are separate baskets.
    add(3, sec("2024-03-04", "12:00:00"), "signup")
    add(3, sec("2024-03-04", "13:00:00"), "error")
    // Random bulk: 3 users × 4 days × random subsets (types "click",
    // "view", "purchase" only — "signup"+"purchase" never co-occur, so
    // that pair row must be absent).
    for (u <- 10L to 12L; day <- 4 to 7) {
      val types = rnd.shuffle(Seq("click", "view", "purchase"))
        .take(1 + rnd.nextInt(3))
      types.foreach { et =>
        (0 to rnd.nextInt(2)).foreach { j =>
          add(u, sec(f"2024-03-0$day%01d", f"1$j%01d:30:00"), et) } }
    }
    rows.toSeq
  }

  private def baskets(rows: Seq[Ev]): Map[(Long, String), Set[String]] =
    rows.groupBy { case (_, s, u, _) =>
      (u, java.time.Instant.ofEpochSecond(s)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
    }.map { case (k, g) => k -> g.map(_._4).toSet }

  for (seed <- Seq(13L, 389L)) {
    lazy val rows = corpus(seed)
    lazy val bk = baskets(rows)
    lazy val nb = bk.size.toLong
    lazy val singles = bk.values.toSeq.flatten.groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    lazy val pairCounts = bk.values.toSeq.flatMap { ts =>
      ts.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }

    test(s"basket corpus plants the declared seams (seed $seed)") {
      assert(bk.exists(_._2.size == 1), "single-type basket missing")
      assert(rows.groupBy(e => (e._3, e._2 / 86400L, e._4)).exists(_._2.size > 1),
        "duplicate same-type events in one basket missing")
      assert(bk.contains((1L, "2024-03-05")) && bk.contains((1L, "2024-03-06")),
        "midnight-straddle baskets missing")
      assert(!pairCounts.contains(("purchase", "signup")) &&
        singles.contains("purchase") && singles.contains("signup"),
        "never-co-occurring pair must be absent while both singles exist")
    }

    test(s"behavior_cooccurrence matches the basket reference (seed $seed)") {
      val expected = pairCounts.toSeq
        .map { case ((a, b), n) => (a, b, n) }.sortBy(p => (p._1, p._2))
      val got = Registry.queries("behavior_cooccurrence")(spark, write(rows)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === expected)
    }

    test(s"behavior_lift matches the basket reference (seed $seed)") {
      val expected = pairCounts.toSeq.map { case ((a, b), s12) =>
        (a, b, s12, roundN(s12.toDouble * nb / (singles(a).toDouble * singles(b)), 4))
      }.sortBy(p => (p._1, p._2))
      val got = Registry.queries("behavior_lift")(spark, write(rows)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got === expected)
    }

    test(s"behavior_confidence matches the basket reference in BOTH " +
      s"directions (seed $seed)") {
      val directed = pairCounts.toSeq.flatMap { case ((a, b), n) =>
        Seq((a, b, n), (b, a, n)) }
      val expected = directed.map { case (ante, cons, s12) =>
        (ante, cons, s12, roundN(s12.toDouble / singles(ante), 4))
      }.sortBy(p => (p._1, p._2))
      // Directionality seam: some pair's two confidences must differ.
      assert(expected.groupBy(e => Set(e._1, e._2)).exists(_._2.map(_._4).distinct.size > 1),
        "no asymmetric confidence pair — directional seam defanged")
      val got = Registry.queries("behavior_confidence")(spark, write(rows)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got === expected)
    }
  }

  private val dirs = scala.collection.mutable.Map[Int, String]()
  private def write(rows: Seq[Ev]): String =
    dirs.getOrElseUpdate(rows.hashCode, {
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-basket-fuzz-").toString
      rows.map { case (id, s, u, et) => (id, s * 1000000000L, u, et, 1.0d) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      dir
    })
}
