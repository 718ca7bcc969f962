package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.LongAdder

/** Real-data workout for the DISTRIBUTED connected-components path: runs
  * the kernel on a corpus whose simhash pair graph exceeds the 2M-pair
  * fast-path threshold (so the RDD min-label/pointer-doubling loop runs
  * un-forced), records rounds + shuffle volume, and cross-checks the
  * labels against the single-task union-find on the SAME graph — two
  * independent implementations agreeing edge-for-edge is the oracle at a
  * scale where the DuckDB recursive-CTE replay is impractical.
  *
  * With a second argument, also times the RELIABLE-checkpoint variant of
  * the loop (checkpoint every 5 rounds into that directory) — quantifying
  * what executor-loss insurance costs relative to localCheckpoint-only.
  *
  * Usage: GRAFT_CC_DEBUG=1 sbt "Test/runMain graft.tools.CcWorkout <sfDir> [ckptDir]"
  */
object CcWorkout {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_cc200"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufWrite = new LongAdder; val shufRead = new LongAdder
    val stages = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.increment()
        shufWrite.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.add(sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead
          + sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead)
      }
    })
    def t[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $label%-28s $s%.2f s"); (r, s)
    }

    val pairs = graft.ops.Dedup.dedupSimhash(spark, d).select(col("doc_a"), col("doc_b"))
      .persist()
    val (nPairs, sketchSec) = t("simhash sketch (pairs)") { pairs.count() }
    require(nPairs > 2000000L,
      s"graph too small for the distributed path: $nPairs pairs (need > 2M)")

    shufWrite.reset(); shufRead.reset(); stages.reset()
    val (loopLabels, loopSec) = t("distributed CC loop") {
      val l = graft.ops.Dedup.connectedComponents(pairs) // un-forced: > 2M
      l.persist(); l.count(); l
    }
    val loopShufW = shufWrite.sum; val loopShufR = shufRead.sum; val loopStages = stages.sum

    // Optional: the executor-loss-safe loop (reliable checkpoint every 5
    // rounds). Same labels by construction; the delta vs loopSec is the
    // insurance premium.
    val (ckptInfo, ckptMism) = args.lift(1) match {
      case Some(ckptDir) =>
        val (ckptLabels, ckptSec) = t("distributed CC loop (ckpt)") {
          val l = graft.ops.Dedup.connectedComponents(pairs,
            checkpointDir = Some(ckptDir))
          l.persist(); l.count(); l
        }
        val m = loopLabels.as("a").join(ckptLabels.as("b"), col("a.id") === col("b.id"), "full_outer")
          .filter(col("a.label").isNull || col("b.label").isNull
            || col("a.label") =!= col("b.label"))
          .count()
        (f""","ckpt_loop_sec":$ckptSec%.2f,"ckpt_label_mismatches":$m""", m)
      case None => ("", 0L)
    }

    val (fastLabels, fastSec) = t("union-find fast path (forced)") {
      val l = graft.ops.Dedup.connectedComponents(pairs, smallGraphThreshold = Long.MaxValue)
      l.persist(); l.count(); l
    }

    // Exact agreement, computed distributedly (no driver collect of labels)
    val mism = loopLabels.as("a").join(fastLabels.as("b"), col("a.id") === col("b.id"), "full_outer")
      .filter(col("a.label").isNull || col("b.label").isNull
        || col("a.label") =!= col("b.label"))
      .count()
    val nNodes = loopLabels.count()
    val nClusters = loopLabels.select(countDistinct(col("label"))).head().getLong(0)
    println(
      s"""CCWORKOUT {"dir":"$d","n_pairs":$nPairs,"n_nodes":$nNodes,"n_clusters":$nClusters,""" +
      f""""sketch_sec":$sketchSec%.2f,"loop_sec":$loopSec%.2f,"fast_sec":$fastSec%.2f,""" +
      s""""loop_stages":$loopStages,"loop_shuffle_write_bytes":$loopShufW,""" +
      s""""loop_shuffle_read_bytes":$loopShufR,"label_mismatches":$mism$ckptInfo}""")
    require(mism == 0, s"distributed loop disagrees with union-find on $mism ids")
    require(ckptMism == 0, s"checkpointed loop disagrees with plain loop on $ckptMism ids")
    spark.stop()
  }
}
