package graft.plans

/** Thread-scoped opt-in for the flag-gated optimizer rules.
  *
  * The registry queries that exercise a whole-plan rewrite (q_topk_exec,
  * q_mv_rollup, q_join_eliminate) used to flip the SESSION-global conf
  * flag around a lazily-forced `optimizedPlan`. That window is tiny but
  * real: any query planned CONCURRENTLY on another thread of the same
  * SparkSession during it would be silently rewritten by a rule the user
  * never opted into (round-8 advisor finding). Catalyst forces
  * `optimizedPlan` on the calling thread, so a ThreadLocal scope gives
  * exactly the isolation wanted: the rule fires for plans forced inside
  * `withFlag` on THIS thread and for sessions that set the conf flag
  * explicitly (the spec/SQL-user path), and for nothing else.
  *
  * The set is additive and re-entrant (nested scopes restore the previous
  * set on exit); flags are the same strings the conf path uses, so each
  * rule's guard is one `||`.
  */
object RuleOptIn {

  private val enabled = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Run `body` with `flag` active for rules evaluated on this thread. */
  def withFlag[T](flag: String)(body: => T): T = {
    val prev = enabled.get()
    enabled.set(prev + flag)
    try body
    finally enabled.set(prev)
  }

  /** True when `flag` is active in the current thread's scope. */
  def active(flag: String): Boolean = enabled.get().contains(flag)
}
