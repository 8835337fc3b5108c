package graft.core

import org.apache.spark.sql.DataFrame

/** Scoped release for operator-internal caches.
  *
  * The dedup/similarity/retrieval operators cache intermediates their
  * lazy results depend on (shingle sets, signature tables, small-side
  * keys). Unscoped, those caches live until `spark.catalog.clearCache()`
  * or session end — fine for a batch job, unbounded growth for a
  * long-lived service invoking operators in a loop. Bracketing the
  * invocation releases exactly the caches it created:
  *
  * {{{
  *   val pairs = CacheScope.scoped {
  *     Dedup.jaccardShinglePairs(docs, "doc_id", "text", 3, 0.8)
  *       .collect()                         // actions INSIDE the scope
  *   }
  * }}}
  *
  * Contract: every action on data derived from the operator must run
  * inside the bracket — at exit the caches unpersist, and later actions
  * would silently recompute the (possibly expensive) lineage. Scopes
  * nest; each releases only its own registrations. Tracking is
  * per-thread (a ThreadLocal), matching how a driver program composes
  * operators sequentially; caches registered by OTHER threads are
  * untouched.
  *
  * Operators register through [[CacheScope.cached]]; with no enclosing
  * scope it is exactly `df.cache()` — the session-wide contract
  * (clearCache()/session end) remains the default.
  */
object CacheScope {

  private val current =
    new ThreadLocal[List[scala.collection.mutable.Buffer[DataFrame]]] {
      override def initialValue: List[
        scala.collection.mutable.Buffer[DataFrame]] = Nil
    }

  /** `df.cache()`, registered with the innermost enclosing scope (if
    * any) for release at bracket exit.
    */
  private[graft] def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    current.get() match {
      case buf :: _ => buf += c
      case Nil => ()
    }
    c
  }

  /** Run `body`; at exit, unpersist every operator cache it created
    * (non-blocking — block-manager cleanup proceeds asynchronously).
    */
  def scoped[A](body: => A): A = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    current.set(buf :: current.get())
    try body
    finally {
      current.set(current.get().tail)
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}
