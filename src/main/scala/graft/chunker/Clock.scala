package graft.chunker

/** Injectable time source for the chunk loop.
  *
  * The reference times everything with `Time::HiRes::time` / `sleep`
  * (reference: lib/DBIx/BatchChunker/LoopState.pm:83-107,
  * lib/DBIx/BatchChunker.pm:1217). Its tests are forced to really sleep in
  * callbacks to exercise runtime targeting (t/dbic.t:269); we inject a clock
  * instead so the control laws are testable deterministically and instantly.
  */
trait Clock {
  /** Seconds since some fixed epoch, fractional. */
  def now(): Double

  /** Sleep for `seconds` (fractional). */
  def sleep(seconds: Double): Unit
}

/** Wall-clock implementation used in production. */
object SystemClock extends Clock {
  override def now(): Double = System.nanoTime() / 1e9
  override def sleep(seconds: Double): Unit =
    if (seconds > 0) Thread.sleep((seconds * 1000).toLong)
}

/** Deterministic clock for tests: time advances only when told to. */
final class ManualClock(var current: Double = 0.0) extends Clock {
  override def now(): Double = current
  override def sleep(seconds: Double): Unit = { current += seconds }
  def advance(seconds: Double): Unit = { current += seconds }
}
