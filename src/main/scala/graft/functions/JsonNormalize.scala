package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Ingest-side normalizer for duplicate JSON keys (round-15, shipping the
  * round-14 probe finding — see the fn_map QueryDef's DUPLICATE KEYS note).
  *
  * The hazard, pinned in DegenerateSweepSpec's control test: real scraped
  * JSON carries duplicate keys (`{"k": 7, "k": 8}`), and Spark's
  * `from_json` to a map type physically RETAINS both entries
  * (`map_keys` = `[k, k]`). Such a map is poison downstream — `map_concat`
  * throws `DUPLICATED_MAP_KEY` under the default
  * `spark.sql.mapKeyDedupPolicy=EXCEPTION`, and set operations reject map
  * columns outright — so at 100 TB the dup must be resolved at INGEST, not
  * left to whichever operator first trips over it three stages later.
  *
  * Semantics: FIRST occurrence wins, matching every live JSON reader in
  * the registry's pinned chain (`element_at`/`try_element_at` scan to the
  * first entry, `get_json_object` is first-wins, DuckDB's `json_extract`
  * and the oracles' k-regex are first-wins). `json_tuple` is the
  * documented LAST-wins outlier no query may use on dup-capable data.
  *
  * Two implementations share one contract, differentially tested in
  * JsonNormalizeSpec: the native Catalyst expression
  * [[MapDedupKeysFirstWins]] (a single O(k) hash pass with a zero-copy
  * fast path for clean maps — the public entry point) and a pure
  * built-in higher-order-function twin (`map_entries` → indexed `filter`
  * with an `exists` scan over the entry's prefix → `map_from_entries`,
  * O(k²) interpreted — kept as the portable cross-check). Both are fully
  * distributed, UDF-free, and NULL-transparent (a malformed-JSON NULL
  * map stays NULL through every step).
  */
object JsonNormalize {

  /** Return `m` with duplicate keys removed, keeping the FIRST entry for
    * each key. NULL maps pass through as NULL; a map with no duplicates
    * passes through untouched (zero-copy). Requires an atomic key type
    * (JSON maps are string-keyed) — see [[MapDedupKeysFirstWins]].
    */
  def dedupMapKeysFirstWins(m: Column): Column =
    MapExpressions.dedupMapKeys(m)

  /** The higher-order-function twin of [[dedupMapKeysFirstWins]] — same
    * first-wins semantics from Spark built-ins only, O(k²) per row with
    * interpreted lambdas. Kept (not exported) as the differential oracle
    * for the native expression: two independent formulations of one
    * contract, compared on every shape in JsonNormalizeSpec.
    */
  private[graft] def dedupMapKeysHof(m: Column): Column = {
    val entries = map_entries(m)
    // keep entry i iff no earlier entry shares its key: slice(_, 1, i)
    // is the 0-based-index-i entry's prefix (1-based slice start, length
    // i), empty at i=0.
    map_from_entries(
      filter(entries, (e, i) =>
        !exists(slice(entries, lit(1), i),
          p => p.getField("key") <=> e.getField("key"))))
  }

  /** `from_json` to `map<string, valueType>` with duplicate keys
    * normalized first-wins — the drop-in ingest reader for dup-capable
    * JSON. Defaults to permissive string values (the fn_map posture: a
    * typed value map NULLs the ENTIRE map when any value fails the type;
    * parse permissively, cast per-field at extraction).
    */
  def fromJsonFirstWins(json: Column, valueType: DataType = StringType): Column =
    dedupMapKeysFirstWins(from_json(json, MapType(StringType, valueType)))
}
