package graft

/** In-JVM phase-timing collector for composite entries (e.g.
  * `ann_trained_ivf`, `e2_schema_evolve`): a stage wrapped in
  * [[phase]] accumulates its wall seconds under a name; [[Bench]]
  * drains the accumulator after each query and reports the breakdown,
  * so a composite regression localizes to train vs convert vs search
  * without re-profiling. Entries use local stage names; the drainer
  * prefixes the query name. Collection is passive — when nothing
  * drains (Verify, tests), the map just holds a few doubles.
  */
object PhaseTimer {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def phase[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally acc.merge(name, Double.box((System.nanoTime() - t0) / 1e9),
      (a, b) => Double.box(a + b))
  }

  /** Snapshot and reset — per-query bracketing is the caller's job. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val out = acc.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
    acc.clear()
    out
  }
}
