package graft.functions

import org.apache.spark.sql.SparkSession

/** Session-aware availability check for the engine's native Catalyst
  * expressions.
  *
  * Column helpers like `TextOps.tokenCount` or [[Exprs.localeNumeric]] are
  * plain library functions — nothing forces a caller's session to have
  * `GraftExtensions` installed, and `call_function` on an unregistered name
  * fails at analysis time. Helpers backed by a native expression therefore
  * keep their original built-in formulation as a fallback (the exact Column
  * chain the native scan replaced, pinned bit-equivalent by the same spec
  * that pins the scan) and pick a side at Column-CONSTRUCTION time against
  * the active session:
  *
  *  - active session with the function registered → the native scan;
  *  - active session without it (extensions not installed) → the fallback,
  *    so library consumers on a vanilla session still get correct results,
  *    just at the pre-native speed;
  *  - no active session (a plan fragment built ahead of any session) → the
  *    fallback, which is correct on every session.
  *
  * The probe reads the session's FunctionRegistry through the public
  * `catalog.functionExists` API — no catalyst internals, and cheap enough
  * for per-helper-call use (a registry lookup, no analysis).
  */
object Native {

  /** True iff the ACTIVE session resolves `name` as a function. */
  def has(name: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try s.catalog.functionExists(name)
      catch { case _: Throwable => false }
    }
}
