package graft

import java.nio.file.Files

/** Differential fuzz for `win_rolling_median` (round-7 verification
  * depth). Spark has no percentile window aggregate, so the query
  * materializes the 7-row frame with collect_list, sorts, and picks the
  * middle element — structurally nothing like the oracle's `median()
  * OVER`. The seams that formulation owns: frames dominated by DUPLICATE
  * values (the sort must still land on the 4th order statistic), negative
  * values, users with fewer than 7 events (no full frame → no output
  * rows), and users with exactly 7. The driver's `value` column is nearly
  * continuous, so duplicates essentially never occur there; draw from an
  * 8-value pool instead and compare against a brute-force sliding-window
  * order statistic.
  */
class RollingMedianFuzzSpec extends SparkSpec {

  for (seed <- Seq(23L, 501L)) {
    test(s"win_rolling_median equals the brute-force 4th order statistic (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val pool = Seq(-3.5, -1.25, 0.0, 0.5, 2.75, 2.75, 10.0, 1e6)
      val base = 1704067200L * 1000000000L
      // users: 0 has 3 events (below frame), 1 has exactly 7, 2-4 have ~80
      val counts = Seq(0L -> 3, 1L -> 7, 2L -> 80, 3L -> 80, 4L -> 80)
      var id = 0L
      val rows = counts.flatMap { case (u, n) =>
        (0 until n).map { _ =>
          id += 1
          (id, base + id * 1000000000L, u, pool(rnd.nextInt(pool.size)))
        }
      }
      val dir = Files.createTempDirectory("graft-med-fuzz-").toString
      rows.toDF("event_id", "ts", "user_id", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      // Reference parameterized by its two boundaries — frame length and
      // order-statistic index — for the automated TEETH check below.
      def ref(frameLen: Int, statIdx: Int): Seq[(Long, Long, Double)] =
        rows.groupBy(_._3).toSeq.flatMap { case (u, g) =>
          val ordered = g.sortBy(_._1)
          ordered.indices.drop(frameLen - 1).map { i =>
            val frame = ordered.slice(i - (frameLen - 1), i + 1).map(_._4).sorted
            (u, ordered(i)._1, frame(statIdx))
          }
        }.sortBy(t => (t._1, t._2))
      val expected = ref(7, 3)
      assert(expected.nonEmpty)
      assert(expected.exists(_._3 == 2.75), "duplicate-heavy frames not exercised")
      // TEETH (VERDICT r08 #5): the adjacent order statistic and a
      // one-shorter frame must both change the expected output — if the
      // value pool degenerates (all frames constant around the middle) or
      // the exactly-7 seam user disappears, these go red.
      assert(expected != ref(7, 2),
        "3rd-vs-4th order statistic flip invisible — frames constant around the median")
      assert(expected.size != ref(6, 3).size,
        "frame-length flip invisible — no user straddles the 6/7 frame boundary")

      val got = Registry.queries("win_rolling_median")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      }.toSeq
      assert(got === expected)
      assert(!got.exists(_._1 == 0L), "a user with <7 events must emit no frames")
      assert(got.count(_._1 == 1L) === 1, "a user with exactly 7 events emits one frame")
    }
  }
}
