package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}

/** Native Catalyst expression for first-wins duplicate-key removal over a
  * map column — the scale path behind
  * [[graft.functions.JsonNormalize.dedupMapKeysFirstWins]].
  *
  * The higher-order-function formulation (`map_entries` → indexed `filter`
  * with an `exists` scan over each entry's prefix → `map_from_entries`) is
  * semantically identical but O(k²) per row with one interpreted lambda
  * call per comparison; this is a single O(k) hash pass, and — the part
  * that matters at 100 TB ingest, where duplicate keys are RARE — the
  * clean-map fast path detects "no duplicates" in one scan and returns the
  * original MapData with NO allocation or copy. Only genuinely-dup maps
  * pay for a rebuild.
  *
  * [[CodegenFallback]] rather than `doGenCode`, deliberately: unlike
  * [[CosineSimilarity]]'s primitive loop there is no tight-arithmetic win
  * to claim — the work is hash-set membership and (on the rare dup row) a
  * heap rebuild of the map, identical JVM code either way, so generated
  * Java would duplicate the eval body for no measurable gain. The
  * expression still participates in the surrounding WholeStageCodegen via
  * the fallback call.
  *
  * Key type is restricted to atomic NON-BINARY types (string/numeric/etc.
  * — JSON maps are string-keyed): those catalyst values (`UTF8String`,
  * boxed primitives, `Decimal`) have `equals`/`hashCode` that agree with
  * SQL map-key equality, while array/struct keys don't in general and
  * BinaryType's `Array[Byte]` is identity-based — either would make the
  * dedup silently vacuous, so both are rejected at analysis time
  * (review r15 finding). The one Java-vs-SQL equality gap among the
  * admitted types is floating-point negative zero (`-0.0 != 0.0` under
  * boxed `equals`, one key under SQL semantics — boxed NaN, by contrast,
  * already equals itself like SQL wants), closed by canonicalizing -0.0
  * before hashing. Map keys are never null by Spark's map contract.
  * First-wins matches the pinned JSON reader chain — see
  * [[JsonNormalize]].
  */
case class MapDedupKeysFirstWins(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_dedup_map_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // AtomicType itself is private[sql]; the equivalent public-API check
    // is "no nested key type" (map keys can never be maps, so array and
    // struct are the two complex possibilities) — plus BinaryType, whose
    // Array[Byte] values compare by identity, not content.
    case MapType(kt, _, _)
        if !kt.isInstanceOf[ArrayType] && !kt.isInstanceOf[StructType] &&
          kt != BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dedup_map_keys requires a map with an atomic non-binary key type, got ${other.sql}")
  }

  // hoisted off the per-row path (the type never changes across rows);
  // @transient because expressions serialize to executors and re-derive
  // lazily there
  @transient private lazy val MapType(keyType, valueType, _) = child.dataType

  /** Boxed-equality canonicalization: -0.0 and 0.0 are ONE key under SQL
    * map semantics but distinct under boxed `equals`. (Boxed NaN already
    * equals itself, matching SQL's all-NaNs-equal.)
    */
  private def canonKey(k: Any): Any = k match {
    case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case x => x
  }

  override protected def nullSafeEval(m: Any): Any = {
    val map = m.asInstanceOf[MapData]
    val kt = keyType
    val vt = valueType
    val n = map.numElements()
    if (n <= 1) return map // can't carry a duplicate
    val keys = map.keyArray()
    val seen = new java.util.HashSet[Any](Math.max(8, n * 2))
    var i = 0
    var firstDup = -1
    while (i < n && firstDup < 0) {
      if (!seen.add(canonKey(keys.get(i, kt)))) firstDup = i
      i += 1
    }
    if (firstDup < 0) map // clean map: no further allocation, no copy
    else {
      val vals = map.valueArray()
      seen.clear()
      val kb = new Array[Any](n)
      val vb = new Array[Any](n)
      var kept = 0
      var j = 0
      while (j < n) {
        val k = keys.get(j, kt)
        if (seen.add(canonKey(k))) {
          kb(kept) = k // keep the ORIGINAL first key, canon only for lookup
          vb(kept) = vals.get(j, vt)
          kept += 1
        }
        j += 1
      }
      new ArrayBasedMapData(
        new GenericArrayData(java.util.Arrays.copyOf(kb.asInstanceOf[Array[AnyRef]], kept)),
        new GenericArrayData(java.util.Arrays.copyOf(vb.asInstanceOf[Array[AnyRef]], kept)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MapDedupKeysFirstWins =
    copy(child = newChild)
}

object MapExpressions {
  /** Column-API entry point for [[MapDedupKeysFirstWins]]. */
  def dedupMapKeys(m: Column): Column =
    Bridge.column(MapDedupKeysFirstWins(Bridge.expression(m)))
}
