package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness (r18 optimization round): run one catalog entry and
  * attribute its wall-clock to SPARK JOBS — per-job duration plus the gaps
  * BETWEEN jobs (driver-side planning, JDBC/Derby work, file maintenance),
  * which TimeOne's single number conflates. The guide's §1 "empirical"
  * loop needs to know whether an entry's seconds sit in cluster compute
  * (optimize the plan) or between jobs (optimize the lifecycle); with the
  * UI disabled in this sandbox, a listener log is the instrument.
  * Usage: Test/runMain graft.tools.ProfileOne <sfDir> <name> [reps]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args(1).split(",").toSeq
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class J(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val cs = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(e.jobId, J(e.jobId, if (d.nonEmpty) d else cs, e.time, -1L))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    })
    // Task-level attribution: run/cpu/gc/deserialize/shuffle totals.
    val taskTot = new java.util.concurrent.atomic.AtomicLongArray(6)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTot.addAndGet(0, m.executorRunTime)
          taskTot.addAndGet(1, m.executorCpuTime / 1000000L)
          taskTot.addAndGet(2, m.jvmGCTime)
          taskTot.addAndGet(3, m.executorDeserializeTime)
          taskTot.addAndGet(4, m.shuffleReadMetrics.fetchWaitTime)
          taskTot.addAndGet(5, m.shuffleWriteMetrics.writeTime / 1000000L)
        }
      }
    })

    for (name <- names; run <- 1 to n) {
      jobs.clear(); order.clear()
      (0 until 6).foreach(i => taskTot.set(i, 0L))
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // Let listener events drain before reading (no public flush API).
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toList.map(jobs.get).filter(_ != null).sortBy(_.start)
      val jobSec = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      // Gap accounting: time between one job's end and the next one's start.
      var gaps = 0.0
      js.sliding(2).foreach {
        case List(a, b) if b.start > a.end => gaps += (b.start - a.end) / 1e3
        case _ =>
      }
      println(f"PROFILE $name run$run wall=$wall%.2f jobs=${js.size} jobSec=$jobSec%.2f gapSec=$gaps%.2f " +
        f"taskRun=${taskTot.get(0) / 1e3}%.2f cpu=${taskTot.get(1) / 1e3}%.2f gc=${taskTot.get(2) / 1e3}%.2f " +
        f"deser=${taskTot.get(3) / 1e3}%.2f fetchWait=${taskTot.get(4) / 1e3}%.2f shufWrite=${taskTot.get(5) / 1e3}%.2f")
      js.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
        println(f"  JOB ${j.id}%4d ${(j.end - j.start) / 1e3}%7.2f s  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
