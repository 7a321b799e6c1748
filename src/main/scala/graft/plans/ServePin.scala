package graft.plans

/** PER-QUERY memoization scope for pinned serve reads.
  *
  * A registered join tree's serve closures read maintained stores; a
  * single query can touch TWO serve levels (count/sum folded from agg
  * partials, min/max from the extrema multiset — two Aggregate nodes in
  * one plan), and the single writer commits those surfaces
  * sequentially, so two live reads could straddle a batch boundary
  * mid-plan. When the tree registers with a
  * [[graft.sinks.StoreSetRef]], every serve closure resolves its
  * stores through [[resolve]]: the FIRST resolution inside a rewrite
  * scope takes one `snapshot()` (all surfaces pinned to one committed
  * ref) and every later resolution in the same scope reuses it — so
  * all serve levels of one query observe the same batch boundary,
  * all-old or all-new, at manifest cost.
  *
  * [[MaterializedJoinRewrite.apply]] opens the scope (one per
  * optimizer invocation = one per query plan); a resolution outside
  * any scope computes un-memoized, which a single-level read is free
  * to do. Thread-confined (Catalyst rules run on the query's planning
  * thread); re-entrant rule invocations keep the OUTER scope so a
  * serve closure's own plan analysis cannot re-pin.
  */
object ServePin {

  private val scopeCache =
    new ThreadLocal[java.util.IdentityHashMap[AnyRef, AnyRef]]()

  /** Test-only seam: runs right after a scope's first pin is computed —
    * CrossSurface-style specs inject a mid-read append + commit here to
    * prove later resolutions still answer from the pinned ref. */
  @volatile private[graft] var onPin: () => Unit = () => ()

  /** Run `f` with a fresh pin scope (kept if one is already active —
    * re-entrant rule invocations must not re-pin). */
  def scoped[T](f: => T): T =
    if (scopeCache.get() != null) f
    else {
      scopeCache.set(new java.util.IdentityHashMap[AnyRef, AnyRef]())
      try f finally scopeCache.remove()
    }

  /** The scope-memoized value for `key` (identity-keyed — one pin per
    * registered ref object); outside a scope, computes directly. */
  def resolve[V <: AnyRef](key: AnyRef)(compute: => V): V = {
    val cache = scopeCache.get()
    if (cache == null) compute
    else {
      val hit = cache.get(key)
      if (hit != null) hit.asInstanceOf[V]
      else {
        val v = compute
        cache.put(key, v)
        onPin()
        v
      }
    }
  }
}
