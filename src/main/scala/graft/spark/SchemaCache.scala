package graft.spark

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.types.StructType

/**
 * Schema-inference cache for IMMUTABLE versioned dirs (guide §1/§5: the
 * driver should not redo single-threaded work per read).
 *
 * Every `spark.read.load(paths)` / DSv2 `FileTable.schema()` runs one
 * Spark job over parquet/ORC footers (`SchemaMergeUtils
 * .mergeSchemasInParallel` — a distributed job even for ONE footer) plus
 * the driver-side submission cost. A multi-commit lifecycle query issues
 * dozens of versioned reads, so footer jobs alone account for seconds per
 * query (measured: ~16% of q101's wall in `mergeSchemasInParallel`
 * samples, plus one "schema at GraftTableCatalog" job per SQL statement).
 *
 * Version dirs and overlay dirs are IMMUTABLE once referenced (labels are
 * mint-unique; overlay/`_deletes` dirs are staged then atomically
 * published under fresh commit ids), so the footer-derived schema of a
 * given path LIST can never change — caching it is sound, with no
 * invalidation protocol. Evolution is naturally covered: a new commit
 * serves a DIFFERENT path list (new version label), which is a different
 * key. Type widening overrides ride ABOVE this cache (the reader applies
 * an explicit schema), unaffected.
 *
 * The cache is process-wide and bounded: entries are O(schema) strings
 * and the key space grows with distinct (table state) reads; at `MaxKeys`
 * it resets rather than evicting (simplicity over LRU — a reset costs one
 * re-inference per live state, and the bench's temp-table churn is the
 * only workload that ever approaches the bound).
 */
object SchemaCache {

  private val MaxKeys = 8192
  private val cache = new ConcurrentHashMap[String, StructType]()

  private def key(format: String, mergeSchema: Boolean, paths: Seq[String]): String =
    s"${format}\u0000${mergeSchema}\u0000${paths.sorted.mkString("\u0000")}"

  /** The cached schema for exactly `paths` under `format`, computing (and
    * caching) via `infer` on first sight. `paths` must all be immutable
    * published version/overlay dirs — never staging or sidecar dirs that
    * can be re-published in place. */
  def getOrInfer(
      format: String,
      mergeSchema: Boolean,
      paths: Seq[String])(infer: => StructType): StructType = {
    if (cache.size() > MaxKeys) cache.clear()
    val k = key(format, mergeSchema, paths)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val schema = infer
      cache.put(k, schema)
      schema
    }
  }

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
