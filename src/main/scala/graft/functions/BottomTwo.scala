package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Record types for [[BottomTwo]] (top-level: an Aggregator cannot be
  * parameterized by its own members — cyclic reference).
  */
/** Shared registered [[BottomTwo]] udaf (round 21, VERDICT r20 #3
  * pattern, as TopKNeighbors): one module-level instance so every
  * invocation reuses the resolved encoders and plan-cache keys instead
  * of paying the per-call UserDefinedAggregator setup.
  */
object BottomTwoUdaf {
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(BottomTwo)
}

object BottomTwoTypes {
  /** nl = price IS NULL (sorts last); np = −price (so ascending np is
    * descending price); k = the tie-break / output key.
    */
  final case class In(nl: Boolean, np: Double, k: Long)
  final case class Slot(set: Boolean, nl: Boolean, np: Double, k: Long)
  final case class Buf(s1: Slot, s2: Slot)
  final case class Out(top: Option[Long], second: Option[Long])
}

/** Custom UDAF (SURVEY B.5 `win_first_nth`): the 2 smallest rows per group
  * under the lexicographic sort key (nullLast, negPrice, key) — i.e. the
  * top-2 by (price DESC NULLS LAST, key ASC) — returning both keys.
  *
  * The round-17 two-phase shape (tpid-salted WindowGroupLimit candidates →
  * per-group merge → broadcast) bounded per-task state but paid a map-side
  * sort of every partition plus a salt-window exchange. This buffer is the
  * same bound made direct: O(1) per-row push into a 2-slot state, O(1)
  * merge, map-side combinable like any built-in — no sort, no salt window,
  * one tiny exchange. SecondMax set the precedent; like there, the state
  * is a flat tuple so the aggregate stays cheap to encode.
  *
  * Buffer/output: (found1, key1, found2, key2) plus the two sort keys; an
  * explicit found flag instead of a key sentinel, so arbitrary (including
  * negative) NON-NULL keys from degenerate fixtures can never collide
  * with "unset".
  *
  * PRECONDITION (ADVICE r18 #2): `In.k` is a non-nullable Long, so a NULL
  * key fails LOUDLY at encoding time — it cannot silently mis-rank. The
  * one caller (win_first_nth) keys on p_partkey, the part table's primary
  * key, which no fixture (driver or degenerate) nulls; a future caller
  * with nullable keys must pass coalesce(key, sentinel) plus an explicit
  * null-key flag column, mirroring how the price's nullability is
  * carried in `nl`.
  */
object BottomTwo extends Aggregator[
    BottomTwoTypes.In, BottomTwoTypes.Buf, BottomTwoTypes.Out] {

  import BottomTwoTypes.{Buf, In, Out, Slot}

  private val emptySlot = Slot(set = false, nl = false, np = 0d, k = 0L)

  /** Strict lexicographic "a before b" matching Spark's sort semantics on
    * doubles: IEEE == first (so 0.0 and −0.0 tie, as Spark's normalized
    * ordering has them), a NaN pair ties (Spark sorts NaNs as equal),
    * otherwise Double.compare (which puts a lone NaN last, like Spark's
    * NaN-greatest ordering). Ties fall through to the key.
    */
  private def lt(a: In, b: Slot): Boolean =
    if (a.nl != b.nl) b.nl // false (non-null price) sorts first
    else if (a.np == b.np || (a.np.isNaN && b.np.isNaN)) a.k < b.k
    else java.lang.Double.compare(a.np, b.np) < 0

  private def push(b: Buf, v: In): Buf =
    if (!b.s1.set || lt(v, b.s1))
      Buf(Slot(set = true, v.nl, v.np, v.k), b.s1)
    else if (!b.s2.set || lt(v, b.s2))
      Buf(b.s1, Slot(set = true, v.nl, v.np, v.k))
    else b

  override def zero: Buf = Buf(emptySlot, emptySlot)

  override def reduce(b: Buf, v: In): Buf = push(b, v)

  override def merge(a: Buf, b: Buf): Buf = {
    var acc = a
    if (b.s1.set) acc = push(acc, In(b.s1.nl, b.s1.np, b.s1.k))
    if (b.s2.set) acc = push(acc, In(b.s2.nl, b.s2.np, b.s2.k))
    acc
  }

  override def finish(b: Buf): Out =
    Out(if (b.s1.set) Some(b.s1.k) else None,
        if (b.s2.set) Some(b.s2.k) else None)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}
