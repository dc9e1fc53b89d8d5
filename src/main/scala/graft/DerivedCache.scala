package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialization cache for *derived* tables.
  *
  * In the reference, HAS_KEYWORD / BELONGS_TO are **stored** rel tables
  * (Kùzu materializes them at load; notebook/Edits.ipynb:1264-1277) —
  * queries never re-derive them. The testdata star schema instead
  * derives the edge sets from lineitem per query, which re-pays a full
  * distinct-shuffle each time. This cache is the stored-table analog:
  * the first query materializes the derived table (honest cost, shows
  * up in its bench time), subsequent queries in the same session reuse
  * it — exactly how an engine's buffer pool / materialized catalog
  * behaves.
  *
  * Keyed weakly by SparkSession so Datasets never outlive their
  * session (a cached plan holds its session; leaking it across
  * sessions would resurrect stopped contexts). At cluster scale this
  * is `CACHE TABLE` over the shared store — MEMORY_AND_DISK so a
  * 100 TB-scale derived table degrades to disk instead of OOM.
  */
object DerivedCache {

  private val sessions =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Any]]()

  private def slot(s: SparkSession, key: String)(build: => Any): Any =
    sessions.synchronized {
      var m = sessions.get(s)
      if (m == null) { m = scala.collection.mutable.Map[String, Any](); sessions.put(s, m) }
      m.getOrElseUpdate(key, build)
    }

  /** Memoized, persisted derived DataFrame. `build` runs at most once
    * per (session, key); the persist is lazy, so the first *action*
    * pays materialization. */
  def dataFrame(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    slot(s, key)(build.persist(StorageLevel.MEMORY_AND_DISK)).asInstanceOf[DataFrame]

  /** Memoized arbitrary derived structure (e.g. a cached GraphX graph
    * plus its vertex dictionary). Caller is responsible for calling
    * .cache() on RDD-bearing values inside `build`. */
  def any[T](s: SparkSession, key: String)(build: => T): T =
    slot(s, key)(build).asInstanceOf[T]

  /** Drop a cached entry and free its storage (blocking, so the
    * executor blocks are actually gone before the caller proceeds).
    * The scale analog of `UNCACHE TABLE`: a long-running smoke over
    * many shared chains unpersists each one after its LAST consumer,
    * bounding peak storage by the largest chain instead of their sum —
    * the round-9 sf10 ENOSPC came from two ~2.8 ks pair caches pinned
    * for the whole run. No-op if the key was never built. */
  def release(s: SparkSession, key: String): Unit = sessions.synchronized {
    val m = sessions.get(s)
    if (m != null) m.remove(key).foreach {
      case ds: org.apache.spark.sql.Dataset[_] => ds.unpersist(blocking = true)
      case _ => // non-Dataset values (stores, graphs) own their own storage
    }
  }
}
