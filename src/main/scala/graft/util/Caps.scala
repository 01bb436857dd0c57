package graft.util

/** Session-wide driver-arm cap override (optimization round 19, verdict
  * r18 #1). Every cap-gated in-memory fast path ("driver arm") reads its
  * DEFAULT cap through [[cap]]: when -Dgraft.driverCap is set, that value
  * replaces every operator default — 0 forces the UNCHANGED distributed
  * chain everywhere, which is how graft.Verify runs so the DuckDB oracle
  * certifies the Spark implementations that execute at 100 TB scale (the
  * driver arms stay pinned arm ≡ distributed by the unit suites, and by
  * armed-mode selfchecks). The bench and normal sessions leave the
  * property unset and get the operator defaults. Call sites that pass an
  * EXPLICIT driverCap (tests pinning a specific arm, ScaleProbe's
  * driverCap = 0 probes) are untouched — the override rides only the
  * parameter defaults, evaluated per call. */
object Caps {
  def cap(default: Long): Long =
    sys.props.get("graft.driverCap")
      .flatMap(p => scala.util.Try(p.trim.toLong).toOption)
      .getOrElse(default)
}
