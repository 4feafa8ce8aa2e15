package graft.functions

/** Run an expensive at-construction validation exactly once per table
  * identity (r18 advisory, `IvfOps.scala:59`).
  *
  * The IVF/PQ overflow guards are EXACT scans of the whole quantized
  * table — O(nCells·dims) ≈ 786k `Math.*Exact` ops at the 1024×768
  * production geometry. Catalyst copies expressions freely during
  * analysis and optimization (`withNewChildInternal` → `copy` → trait
  * re-init), so a trait-initializer `require` re-executes the full scan
  * several times per query plan, pure waste: the table reference is the
  * SAME array across copies, so one validation proves them all.
  *
  * Memoization is by reference identity (arrays don't override `equals`,
  * so `WeakHashMap` keys compare by identity here) with weak keys,
  * letting dropped tables unpin. A failed check throws and is never
  * cached, so every later construction with the same bad table fails
  * again at construction — the loud-failure convention is unchanged,
  * only the redundant re-scan goes. Driver-only by construction: Java
  * deserialization on executors skips constructor bodies, so these
  * guards never ran task-side anyway.
  *
  * Both counters below are per-table and only for GuardSpec, which pins
  * the two halves of the claim: Catalyst really does re-enter the guard
  * (`callsFor` > 1 across one analyzed query — the cost being saved is
  * real) while the validation body runs once (`runsFor` == 1).
  *
  * IMMUTABILITY CONTRACT (r19 advisory): memoization assumes the table
  * is immutable after its first validation. A caller that mutates a
  * centroid/codebook array IN PLACE after one expression was built gets
  * later constructions with the shape/overflow guards silently skipped —
  * and, worse, executors that already captured the old values. Every
  * in-repo caller ([[IvfExpression]], [[PqExpression]]) builds its table
  * fresh on the driver and never writes to it again; external callers
  * must treat the array passed to `IvfNearestCell.of` / `PqCodes.of` etc.
  * as frozen, or pass a defensive copy. (Copying here instead would
  * defeat the point — the copy is O(table), the exact cost being
  * memoized away.)
  */
private[graft] object GuardOnce {
  // guarded by `lock`: WeakHashMap is not thread-safe and the analyzer
  // can construct expressions from concurrent sessions/suites
  private val lock = new Object
  private val validated = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  private val entered = new java.util.WeakHashMap[AnyRef, java.lang.Long]()

  /** Times the validation body actually executed for this table. */
  private[graft] def runsFor(table: AnyRef): Long =
    lock.synchronized(Option(validated.get(table)).fold(0L)(_.longValue))

  /** Times any expression construction reached the guard for this table. */
  private[graft] def callsFor(table: AnyRef): Long =
    lock.synchronized(Option(entered.get(table)).fold(0L)(_.longValue))

  def apply(table: AnyRef)(check: => Unit): Unit = {
    val skip = lock.synchronized {
      entered.put(table, 1L + Option(entered.get(table)).fold(0L)(_.longValue))
      validated.containsKey(table)
    }
    if (!skip) {
      check
      // benign race: two first constructions of the same table validate
      // twice — never a missed validation, and the count records it
      lock.synchronized(
        validated.put(table, 1L + Option(validated.get(table)).fold(0L)(_.longValue)))
    }
  }
}
