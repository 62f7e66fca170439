package graft

import org.apache.spark.sql.DataFrame

/** Query-scoped persist handles (VERDICT r3 finding: query-local
  * `.persist()` frames — q11's partial agg, q15/q17/q21's shared
  * subtrees, PQ's distance table — were never unpersisted, so by
  * mid-family the accumulated blocks inflated every later query's
  * materialization under memory pressure).
  *
  * A builder that persists a frame consumed only within its own query
  * registers it here instead of calling `.persist()` directly; the
  * harness (Bench per query, Verify per query, specs via their base)
  * drains the queue once the query's action completes. Family-shared
  * frames (the dedup pipeline memo, the ANN corpus) deliberately do
  * NOT go through here — their lifetime is the family, not the query.
  */
object ScopedCache {
  private val handles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for release at the next
    * `releaseAll()` (i.e. when the enclosing query finishes). */
  def apply(df: DataFrame): DataFrame = {
    df.persist()
    handles.add(df)
    df
  }

  /** Unpersist every handle registered since the last drain. Safe to
    * call while a handle's plan is still referenced — a later access
    * just recomputes. */
  def releaseAll(): Unit = {
    var h = handles.poll()
    while (h != null) {
      h.unpersist()
      h = handles.poll()
    }
  }
}
