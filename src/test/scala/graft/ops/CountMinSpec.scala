package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Count-Min audit: an independent driver-side CMS (same KM constants, same
  * 28-bit md5 base hash) must reproduce every estimate exactly, and the
  * one-sided guarantee (never undercount) must hold for every probe.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private val P = 2147483647L
  private val W = 64
  private val params = Seq((976369L, 130363L), (875983L, 440191L), (647011L, 568021L), (508607L, 9187L))

  private def baseHash(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  test("the cells build scans the corpus exactly once (no per-hash-row rescan)") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val scans = graft.PlanTest.executedNodes(TextAnalysis.cmsCells(docs)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(scans.size == 1,
      s"CMS cells must be built in ONE corpus pass, found ${scans.size} document scans")
  }

  test("estimates equal a driver-side CMS replay and never undercount") {
    val bigrams = spark.read.parquet(s"$d/documents.parquet")
      .select(col("text")).collect().flatMap { r =>
        val w = r.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty)
        w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      }.toSeq
    val cells = Array.fill(params.size, W)(0L)
    bigrams.foreach { t =>
      val h = baseHash(t)
      params.zipWithIndex.foreach { case ((a, b), i) =>
        cells(i)((((h * a) + b) % P % W).toInt) += 1L
      }
    }
    val truth = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def est(t: String): Long = {
      val h = baseHash(t)
      params.zipWithIndex.map { case ((a, b), i) =>
        cells(i)((((h * a) + b) % P % W).toInt)
      }.min
    }
    val rows = TextAnalysis.countMinAudit(spark, d).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (term, tc, ec, oc) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tc == truth(term), s"truth mismatch for '$term'")
      assert(ec == est(term), s"estimate mismatch for '$term'")
      assert(oc == ec - tc && oc >= 0, s"one-sided guarantee violated for '$term'")
    }
  }
}
