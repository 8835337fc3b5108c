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
  * nest; each releases only its own registrations.
  *
  * Thread scoping: the plain bracket tracks registrations per-thread
  * (a ThreadLocal), matching how a driver program composes operators
  * sequentially. When operator calls happen on OTHER threads —
  * `foreachBatch` micro-batch threads, a parallel-collection driver —
  * use [[scopedWith]], whose [[Scope]] handle is passable: a child
  * thread wraps its operator calls in `handle.attached { ... }` and its
  * caches release with the owning bracket (thread-safe registration;
  * spec-asserted from a real child thread). Without that, cross-thread
  * registrations silently fall back to the session-wide contract.
  *
  * Operators register through [[CacheScope.cached]]; with no enclosing
  * scope it is exactly `df.cache()` — the session-wide contract
  * (clearCache()/session end) remains the default.
  */
object CacheScope {

  /** A passable scope handle — see [[scopedWith]]. Registration is
    * thread-safe; release happens exactly once, when the owning
    * bracket exits.
    */
  final class Scope private[CacheScope] () {
    private[CacheScope] val frames =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
    @volatile private[CacheScope] var released = false

    /** Run `body` on the CURRENT thread with operator-cache
      * registrations routed to this scope — the child-thread side of
      * [[scopedWith]]. Nests like the plain bracket (innermost wins).
      */
    def attached[A](body: => A): A = {
      current.set(this :: current.get())
      try body
      finally current.set(current.get().tail)
    }

    private[CacheScope] def register(df: DataFrame): Unit = {
      frames.add(df)
      // close the exit race: a registration that lands AFTER the owning
      // bracket released (a micro-batch still in flight at exit) would
      // otherwise sit in a queue nobody drains again — leak on every
      // later batch. The drain is idempotent (poll-based), so draining
      // here is safe against concurrent registrars.
      if (released) release()
    }

    private[CacheScope] def release(): Unit = {
      released = true
      var df = frames.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = frames.poll()
      }
    }
  }

  private val current = new ThreadLocal[List[Scope]] {
    override def initialValue: List[Scope] = Nil
  }

  /** `df.cache()`, registered with the innermost enclosing scope (if
    * any) for release at bracket exit.
    */
  private[graft] def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    current.get() match {
      case s :: _ => s.register(c)
      case Nil => ()
    }
    c
  }

  /** Run `body`; at exit, unpersist every operator cache it created on
    * THIS thread (non-blocking — block-manager cleanup proceeds
    * asynchronously).
    */
  def scoped[A](body: => A): A = scopedWith(_ => body)

  /** The cross-thread form: like [[scoped]], but `body` receives the
    * [[Scope]] handle so work dispatched to other threads can attach
    * to the same bracket:
    *
    * {{{
    *   CacheScope.scopedWith { scope =>
    *     stream.writeStream.foreachBatch { (batch, _) =>
    *       scope.attached {            // runs on a micro-batch thread
    *         Dedup.exact(batch, "id", "text").write.(...)
    *       }
    *     }.start(); ...
    *   } // every cache from every attached thread releases here
    * }}}
    */
  def scopedWith[A](body: Scope => A): A = {
    val s = new Scope
    current.set(s :: current.get())
    try body(s)
    finally {
      current.set(current.get().tail)
      s.release()
    }
  }
}
