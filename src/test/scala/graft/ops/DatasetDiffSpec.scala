package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Snapshot diff: the fixture's mutation classes have closed-form counts
  * and char deltas, so every status bucket is pinned exactly — not just
  * oracle-matched but derived from the construction. */
class DatasetDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("status buckets match the fixture's closed form") {
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = Map(
      "removed" -> ids.count(_ % 10 == 7).toLong,
      "changed" -> ids.count(_ % 10 == 3).toLong,
      "added" -> ids.count(_ % 10 == 1).toLong,
      "unchanged" -> ids.count(i => i % 10 != 7 && i % 10 != 3).toLong)
    val got = TextAnalysis.datasetDiffStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0))
  }

  test("per-doc delta excludes unchanged and carries the right char masses") {
    val rows = TextAnalysis.datasetDiff(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._2 != "unchanged"))
    rows.foreach {
      case (id, "added", c1, c2) =>
        // fresh docs live at id + offset with 'fresh ' ++ md5 = 38 chars
        assert(id >= 40000000L && c1 == 0L && c2 == 38L)
      case (id, "removed", c1, c2) =>
        assert(id % 10 == 7 && c1 > 0L && c2 == 0L)
      case (id, "changed", c1, c2) =>
        // ' rev2 ' (6) ++ md5 hex (32) appended to the original
        assert(id % 10 == 3 && c2 == c1 + 38L)
      case other => fail(s"unexpected row $other")
    }
    // the delta is exactly the three mutation classes — nothing else leaks
    val stats = TextAnalysis.datasetDiffStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length.toLong ==
      stats.getOrElse("added", 0L) + stats.getOrElse("removed", 0L) +
        stats.getOrElse("changed", 0L))
  }
}
