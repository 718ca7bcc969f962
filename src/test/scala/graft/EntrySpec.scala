package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The flagship entry: chunked audit over lineitem with a streamed sink
  * (no driver buffer) and compacted readback (no small-files explosion).
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry audits every row exactly once and compacts the audit sink on readback") {
    val audit = SparkEntry.entry(spark)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // every lineitem row lands in exactly one chunk audit
    assert(audit.agg(sum(col("n_rows"))).head().getLong(0) == li.count())
    assert(audit.count() > 0)
    // ~24 chunks wrote ~24 tiny files; the compacted readback is bounded
    assert(audit.inputFiles.length <= 2,
      s"audit readback still has ${audit.inputFiles.length} files")
  }
}
