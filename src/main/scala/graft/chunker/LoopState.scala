package graft.chunker

import scala.collection.mutable.ArrayBuffer

/** One chunk's timing sample for runtime targeting
  * (reference: lib/DBIx/BatchChunker.pm:1589-1600).
  *
  * `chunkPer` measures how much of the nominal chunk size actually produced
  * rows; `rowtime` is runtime normalized by that density, i.e. "seconds per
  * full chunk's worth of rows".
  */
final case class Timing(runtime: Double, chunkCount: BigInt, chunkSize: BigInt) {
  val chunkPer: Double = BigDecimal(chunkCount).toDouble / BigDecimal(chunkSize).toDouble
  val rowtime: Double = runtime / chunkPer
}

/** Mutable per-run loop state, a 1:1 port of
  * reference lib/DBIx/BatchChunker/LoopState.pm:51-326. Driver-side control
  * plane only — this object is never shipped to executors.
  *
  * The multiplier state machine implements the reference's bisection search
  * for a well-sized chunk: `multiplierRange` is the current chunk width in
  * units of `chunkSize`, `multiplierStep` how fast it moves, and
  * `lastRangeMin`/`lastRangeMax` bracket the explored interval
  * (LoopState.pm:187-245).
  */
final class LoopState(initialChunkSize: BigInt, clock: Clock) {
  var totalTimer: Double = clock.now()
  var chunkTimer: Double = clock.now()

  /** Real start id of the current block; survives resize iterations, cleared
    * once a block is processed/skipped (LoopState.pm:109-121). */
  var start: Option[BigInt] = None

  /** Current end id; recomputed every loop iteration (LoopState.pm:123-139). */
  var end: BigInt = BigInt(0)

  /** End id of the last processed-or-skipped block (LoopState.pm:141-151). */
  var prevEnd: Option[BigInt] = None

  /** Bisection bracket, in chunk-size multiplier units (LoopState.pm:153-160). */
  var lastRangeMin: Option[BigDecimal] = None
  var lastRangeMax: Option[BigDecimal] = None

  /** Ring buffer of the last <=5 chunk timings (LoopState.pm:162-170). */
  val lastTimings: ArrayBuffer[Timing] = ArrayBuffer.empty

  var multiplierRange: BigDecimal = BigDecimal(0)
  var multiplierStep: BigDecimal = BigDecimal(1)

  /** Resize attempts on the current block; give up past 10
    * (LoopState.pm:247-258). */
  var checkedCount: Int = 0

  /** Current chunk size — adjusted over time by runtime targeting
    * (LoopState.pm:260-268). */
  var chunkSize: BigInt = initialChunkSize

  /** COUNT-probe result for the current block (LoopState.pm:270-277). */
  var chunkCount: Option[BigInt] = None

  /** What the last resize check decided — debugging aid (LoopState.pm:279-287). */
  var prevCheck: String = ""

  /** Runtime of the previously processed chunk, sans sleep (LoopState.pm:289-297). */
  var prevRuntime: Option[Double] = None

  def markChunkTimer(): Unit = { chunkTimer = clock.now() }

  /** Port of LoopState.pm:219-230. Called when the chunk has too few rows:
    * record the floor of the bracket; bisect if bracketed, else keep
    * accelerating (exponential step growth).
    */
  def increaseMultiplier(): Unit = {
    if (lastRangeMin.forall(multiplierRange > _)) lastRangeMin = Some(multiplierRange)
    multiplierStep = lastRangeMax match {
      case Some(max) => (max - lastRangeMin.get) / 2
      case None      => multiplierStep * 2
    }
  }

  /** Port of LoopState.pm:232-245. Called when the chunk has too many rows:
    * record the ceiling of the bracket, walk the range back to the floor (or
    * one step down), and bisect / decelerate.
    *
    * NB: the walk-back uses Perl truthiness (`$lr->{min} ||`), so a recorded
    * floor of exactly 0 falls through to `range - step`; preserved verbatim.
    */
  def decreaseMultiplier(): Unit = {
    if (lastRangeMax.forall(multiplierRange < _)) lastRangeMax = Some(multiplierRange)
    multiplierRange = lastRangeMin.filter(_ != 0).getOrElse(multiplierRange - multiplierStep)
    multiplierStep = lastRangeMin match {
      case Some(min) => (lastRangeMax.get - min) / 2
      case None      => multiplierStep / 2
    }
  }

  def resetLastTimings(): Unit = lastTimings.clear()

  /** Port of LoopState.pm:311-326 — end-of-block state reset. */
  def resetChunkState(): Unit = {
    start = None
    prevEnd = Some(end)
    markChunkTimer()
    lastRangeMin = None
    lastRangeMax = None
    multiplierRange = BigDecimal(0)
    multiplierStep = BigDecimal(1)
    checkedCount = 0
  }
}
