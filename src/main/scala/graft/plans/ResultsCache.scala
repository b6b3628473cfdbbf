package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Results cache (reference readme.md:405-411: "Results Cache: Serves cached
  * results for identical queries with unchanged data" — one tier of Dremio's
  * layered caching, beside the plan cache Spark already has and the columnar
  * cache the vectorized parquet reader provides).
  *
  * Key = the query's canonicalized optimized plan (identical queries share
  * it regardless of alias/attribute-id differences); guard = a signature of
  * the scanned files (path, length, mtime), so the "with unchanged data"
  * half of the contract is enforced automatically — overwriting an input
  * invalidates without any manual refresh. Spark's own CacheManager serves
  * matching subtrees but keeps serving STALE results after an external
  * overwrite until someone calls refresh; this tier re-checks the inputs on
  * every lookup. LRU-bounded; evicted entries unpersist.
  *
  * Scale: the value cached is the RESULT (typically small — an aggregate or
  * top-k), persisted MEMORY_AND_DISK; the signature probe is driver-side
  * metadata, O(#input files). On an Iceberg catalog the probe becomes the
  * table's snapshot id — same contract, O(1).
  */
final class ResultsCache(spark: SparkSession, maxEntries: Int = 64) {

  /** Matching = `sameResult` on the ANALYZED plans (the same semantic
    * comparison Spark's own CacheManager uses — it covers LocalRelation
    * data and file-relation locations, where structural hashing of relation
    * objects does not). The analyzed plan is deliberate: the OPTIMIZED plan
    * of a repeated query mutates once the first result is persisted (the
    * CacheManager swaps in InMemoryRelation), which would turn every
    * would-be hit into a miss. Lookup is a linear scan — bounded by
    * `maxEntries`, driver-side, trivially cheap next to running a query. */
  private final class Entry(
      val plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      val sig: Long, val result: DataFrame, var lastUsed: Long)

  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
  private var tick = 0L
  private var hitCount = 0L
  private var missCount = 0L

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)

  private def classic(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  /** Serve `df`'s result from cache when an identical query over unchanged
    * inputs was already computed; otherwise compute, persist, and remember. */
  def apply(df: DataFrame): DataFrame = {
    val qe = classic(df).queryExecution
    val plan = qe.analyzed
    val sig = inputSignature(plan)
    synchronized {
      tick += 1
      entries.find(e => e.sig == sig && e.plan.sameResult(plan)) match {
        case Some(e) => e.lastUsed = tick; hitCount += 1; return e.result
        case None => missCount += 1
      }
    }
    val mat = df.persist(StorageLevel.MEMORY_AND_DISK)
    mat.count() // materialize eagerly so the hit path never recomputes
    synchronized {
      entries += new Entry(plan, sig, mat, tick)
      if (entries.length > maxEntries) {
        val eldest = entries.minBy(_.lastUsed)
        eldest.result.unpersist()
        entries -= eldest
      }
    }
    mat
  }

  /** Drop everything (e.g. between benchmark phases). */
  def clear(): Unit = synchronized {
    entries.foreach(_.result.unpersist())
    entries.clear()
  }

  /** FNV-1a over the sorted (path, length, mtime) of every input file — any
    * rewrite, append, or compaction changes it. Files come from the ANALYZED
    * plan's file relations (`df.inputFiles` would consult the plan after
    * CacheManager substitution, where a cached query has no files at all). */
  private def inputSignature(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = plan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
      case _ => Nil
    }.sorted
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st =
        try p.getFileSystem(hconf).getFileStatus(p)
        catch { case _: Exception => null }
      mix(f.##.toLong)
      if (st != null) { mix(st.getLen); mix(st.getModificationTime) }
    }
    h
  }
}
