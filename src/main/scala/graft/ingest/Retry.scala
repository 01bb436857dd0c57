package graft.ingest

/** Retry/backoff policy for flaky RPC fetches — the reference README claims
  * "handles rate limiting (429 errors) with retry logic"
  * (`/root/reference/README.md:132`) but no such code exists in `src/`
  * (SURVEY §0.2.6); this is that policy, implemented as a PURE wrapper
  * around the injected fetch function so it composes with
  * `BlockIngest.backfillRange` / `Topology.launch` unchanged.
  *
  * Semantics:
  *   - a fetch that THROWS (transient failure: HTTP 429/503, socket reset)
  *     is retried up to maxRetries times with exponential backoff
  *     (base·2^attempt, capped);
  *   - `None` (block genuinely absent past the tip) is a RESULT, returned
  *     immediately and never retried;
  *   - after exhausting retries the block is skipped with a log callback —
  *     skip-and-log, not break-the-stream (the same policy as corrupt
  *     messages in `BlockIngest.parse`).
  *
  * The wrapper closes over plain values only, so it serializes into
  * `mapPartitions` closures; sleep and give-up are injectable for tests.
  */
object Retry {

  /** Wrap `fetch` with bounded retries. Total attempts = 1 + maxRetries. */
  def withRetry(
      maxRetries: Int,
      baseDelayMs: Long = 100L,
      maxDelayMs: Long = 10000L,
      sleep: Long => Unit = Thread.sleep,
      onGiveUp: (Long, Throwable) => Unit = (n, e) =>
        org.slf4j.LoggerFactory.getLogger(Retry.getClass)
          .warn(s"block $n: giving up after retries: ${e.getMessage}"))(
      fetch: Long => Option[String]): Long => Option[String] = { n =>
    var attempt = 0
    var result: Option[String] = None
    var done = false
    while (!done) {
      try {
        result = fetch(n)
        done = true
      } catch {
        // NonFatal only: an OutOfMemoryError/LinkageError or a task-cancel
        // InterruptedException must FAIL the task (so Spark reschedules),
        // never be retried or converted into a silent missing block.
        case scala.util.control.NonFatal(e) if attempt < maxRetries =>
          // exponent clamped: a Long shift wraps mod 64, so baseDelayMs <<
          // attempt can go NEGATIVE for large maxRetries and Thread.sleep
          // would throw from inside the catch — breaking the skip-and-log
          // contract. 2^30·base already exceeds any sane maxDelayMs.
          sleep(math.min(baseDelayMs << math.min(attempt, 30), maxDelayMs))
          attempt += 1
        case scala.util.control.NonFatal(e) =>
          onGiveUp(n, e)
          result = None
          done = true
      }
    }
    result
  }
}
