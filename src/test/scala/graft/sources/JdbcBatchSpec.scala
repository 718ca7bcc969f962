package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.chunker.ChunkerConfig

/** JDBC chunked source/sink against embedded Derby — a real live-RDBMS
  * round-trip, the reference's native deployment scenario.
  */
class JdbcBatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val quiet: String => Unit = _ => ()
  private def cfg(size: Int) = ChunkerConfig(chunkSize = BigInt(size), targetTime = 0,
    sleep = 0, minChunkPercent = 0, log = quiet)
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val src = (1L to 500L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "val")
    src.write.mode("overwrite").jdbc(url, "chunk_src", new java.util.Properties)
  }

  test("range discovery over JDBC without a Spark job") {
    seeded
    assert(JdbcBatch.discoverRange(url, "chunk_src", "id").contains((BigInt(1), BigInt(500))))
  }

  test("chunk-partitioned JDBC read: one partition per chunk, all rows exactly once") {
    seeded
    val df = JdbcBatch.readChunked(spark, url, "chunk_src", "id", cfg(100))
    assert(df.rdd.getNumPartitions == 5) // 500 ids / 100 per chunk
    assert(df.count() == 500)
    assert(df.select(countDistinct(col("id"))).head().getLong(0) == 500)
    assert(df.select(sum(col("id"))).head().getLong(0) == (1L to 500L).sum)
  }

  test("sequential chunked JDBC write appends every chunk exactly once") {
    seeded
    val src = (1L to 300L).map(i => (i, s"w_$i", i * 2.0)).toDF("id", "name", "val")
    // create empty target with the right schema
    src.limit(0).write.mode("overwrite").jdbc(url, "chunk_sink", new java.util.Properties)
    val rpt = JdbcBatch.writeChunked(src, "id", cfg(75), url, "chunk_sink")
    assert(rpt.processed.size == 4) // ceil(300/75)
    val back = spark.read.jdbc(url, "chunk_sink", new java.util.Properties)
    assert(back.count() == 300)
    assert(back.select(countDistinct(col("id"))).head().getLong(0) == 300)
  }

  test("empty table: readChunked returns an empty frame without failing") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    empty.write.mode("overwrite").jdbc(url, "chunk_empty", new java.util.Properties)
    val df = JdbcBatch.readChunked(spark, url, "chunk_empty", "id", cfg(100))
    assert(df.count() == 0)
  }
}
