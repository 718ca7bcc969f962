package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shuffle-partition sizing for the BOUNDED stream runners (r18).
  *
  * A stateful streaming query locks its shuffle-partition count into the
  * checkpoint at the first trigger, and AQE is disabled for stateful
  * workloads — so the ONE chance to size the per-batch state-store count is
  * before the run starts. The runners used to pin the constant 8 ("demo
  * sized"); that is 4x oversized for the gate-scale backlogs (every extra
  * partition is an extra state-store provider: load + commit + delta file
  * per micro-batch — measured as taskRun >> executorCpuTime on the join
  * parity entry, i.e. tasks waiting on state-store I/O, 12 s → ~5 s at
  * sf0.1 when right-sized) and 25x UNDERSIZED for a 100 TB deployment.
  *
  * The rule derives the count from the staged backlog's bytes — the same
  * scale-adaptivity AQE would provide for a batch shuffle (guide §2):
  * one partition per `targetBytes` of backlog, floor 2 (never
  * single-partition state: two partitions keep the multi-partition
  * state-store code paths honestly exercised at every scale), cap 200
  * (sized to the sandbox; a cluster deployment raises the cap with its
  * executor count — the knob a production caller sets is still ONE number,
  * but it now scales with data instead of being right only at one scale).
  */
object StreamTuning {
  /** Partition count for a bounded run whose backlog was staged under
    * `stageDir`. 32 MB of backlog per state partition: comfortably more
    * state per partition than these demo streams carry (their state is a
    * small fraction of input bytes) while keeping the per-batch
    * state-store commit count proportional to data. */
  def partitionsFor(s: SparkSession, stageDir: String,
      targetBytes: Long = 32L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(stageDir)
    val bytes =
      try {
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      } catch { case _: java.io.IOException => 0L }
    val n = math.ceil(bytes.toDouble / targetBytes).toInt
    math.max(2, math.min(200, n))
  }

  /** Run `body` (a bounded stream: start + awaitTermination) with the
    * session's shuffle partitions derived from the staged backlog, restoring
    * the previous value after. Also right-sizes the stateLESS foreachBatch
    * runners: their per-micro-batch jobs (signature aggregates, probe
    * joins, sketch folds) inherit the session width — 32 reduce tasks per
    * tiny batch job, ~0.3 s each across the 30-50 jobs of a lifecycle
    * entry, was pure scheduling overhead.
    *
    * Concurrency contract (r19, r18 ADVICE): the bracket mutates the
    * SESSION-global shuffle width, so it assumes a SINGLE-THREADED session
    * — a concurrent batch query planned on the same session inside the
    * bracket would silently inherit the narrowed width. That assumption
    * holds for every caller here (the bench/verify harnesses run entries
    * sequentially). It is NOT an issue for the stream itself or for other
    * sessions: the streaming engine captures the conf at query start, and
    * the conf is per-session. Streams genuinely need the session-conf
    * route (the width locks into the checkpoint before the first trigger
    * — there is no per-plan repartition seam), unlike batch paths, which
    * now thread widths through explicit repartition calls. */
  def withPartitionsFor[T](s: SparkSession, stageDir: String)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", partitionsFor(s, stageDir).toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
