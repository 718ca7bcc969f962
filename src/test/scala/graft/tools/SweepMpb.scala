package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: sweep spark.sql.files.maxPartitionBytes (a runtime conf)
  * over a set of catalog queries in ONE session, to size the scan-split
  * knob empirically instead of by folklore. Each (mpb, query) cell runs
  * twice and reports the second (warm) time; caches that would let one
  * sweep value free-ride on another's materialization are cleared between
  * values. Usage: Test/runMain graft.tools.SweepMpb <sfDir> <mpb1,mpb2,..> <q1,q2,..> */
object SweepMpb {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val mpbs = args(1).split(",").toSeq
    val names = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    mpbs.foreach { mpb =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      spark.catalog.clearCache() // drop persisted views built under the previous width
      names.foreach { name =>
        var t = 0.0
        (1 to 2).foreach { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, d).count()
          t = (System.nanoTime() - t0) / 1e9
        }
        println(f"SWEEP $mpb $name $t%.2f s")
      }
    }
    spark.stop()
  }
}
