package graft.chunker

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Chunked copy-on-write DML: the reference's UPDATE/DELETE workload shape
  * over immutable parquet, with idempotent per-chunk retry.
  */
class ChunkedRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val quiet: String => Unit = _ => ()
  private def cfg0 = ChunkerConfig(chunkSize = 25, sleep = 0, targetTime = 0,
    minChunkPercent = 0, log = quiet)

  test("chunked DELETE (anti-filter rewrite) equals the batch filter") {
    val dir = java.nio.file.Files.createTempDirectory("cow-del").toString
    val src = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")

    ChunkedRewrite.rewrite(table, "id", cfg0, s"$dir/out")(_.filter(col("v") =!= 0))
    val result = ChunkedRewrite.readBack(spark, s"$dir/out")
    val expected = table.filter(col("v") =!= 0)
    assert(result.count() == expected.count())
    assert(result.select(sum(col("id"))).head().getLong(0) ==
      expected.select(sum(col("id"))).head().getLong(0))
  }

  test("chunked UPDATE (column rewrite) equals the batch rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("cow-upd").toString
    val src = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "price")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")

    ChunkedRewrite.rewrite(table, "id", cfg0, s"$dir/out") { chunk =>
      chunk.withColumn("price", when(col("id") % 2 === 0, col("price") * 2).otherwise(col("price")))
    }
    val result = ChunkedRewrite.readBack(spark, s"$dir/out")
    val expectedSum = (1L to 100L).map(i => if (i % 2 == 0) i * 2.0 else i.toDouble).sum
    assert(result.select(sum(col("price"))).head().getDouble(0) == expectedSum)
    assert(result.count() == 100)
  }

  test("a failed chunk retries and overwrites its own output idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("cow-retry").toString
    val src = (1L to 100L).toDF("id")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")

    var failedOnce = false
    val rpt = ChunkedRewrite.rewrite(table, "id",
      cfg0.copy(retryAttempts = 2), s"$dir/out") { chunk =>
      // fail the chunk containing id 30 AFTER its write would have happened:
      // simulate by throwing on first encounter, forcing a re-dispatch
      val hit = chunk.filter(col("id") === 30).count() > 0
      if (hit && !failedOnce) { failedOnce = true; throw new RuntimeException("transient sink failure") }
      chunk
    }
    assert(failedOnce)
    assert(rpt.processed.size == 4)
    val result = ChunkedRewrite.readBack(spark, s"$dir/out")
    assert(result.count() == 100) // no loss, no duplication
    assert(result.select(countDistinct(col("id"))).head().getLong(0) == 100)
  }

  test("per-chunk commit is atomic: a crash mid-chunk leaves no partial chunk visible, and resume completes") {
    val dir = java.nio.file.Files.createTempDirectory("cow-atomic").toString
    val src = (1L to 100L).toDF("id")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")

    // Simulate a run killed mid-chunk: the third chunk's transform throws
    // AFTER its staging write completed (the worst moment — data fully on
    // disk but not committed).
    val cfg = cfg0.copy(retryAttempts = 1) // a single attempt: first failure rethrows
    intercept[RuntimeException] {
      ChunkedRewrite.rewrite(table, "id", cfg, s"$dir/out") { chunk =>
        // trigger on the chunk containing id 60 (chunks are 25 wide)
        if (chunk.filter(col("id") === 60).count() > 0)
          throw new RuntimeException("killed mid-chunk")
        chunk
      }
    }
    // Plant a leftover staging dir with junk — the exact on-disk state a
    // hard kill between staging-write and rename leaves behind.
    val junk = new java.io.File(s"$dir/out/.staging_chunk_51_75")
    junk.mkdirs()
    java.nio.file.Files.writeString(junk.toPath.resolve("part-junk.parquet"), "not parquet")
    // The reader's view after the crash: only fully-committed chunks, no
    // partial output from the killed chunk (staging dirs are invisible).
    val afterCrash = ChunkedRewrite.readBack(spark, s"$dir/out")
    val seen = afterCrash.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(seen.forall(id => id <= 50), s"partial chunk leaked into reader view: ${seen.filter(_ > 50)}")
    assert(afterCrash.count() % 25 == 0, "reader observed a partially-written chunk")

    // Resume: re-run the rewrite (idempotent); every chunk commits.
    ChunkedRewrite.rewrite(table, "id", cfg, s"$dir/out")(chunk => chunk)
    val resumed = ChunkedRewrite.readBack(spark, s"$dir/out")
    assert(resumed.count() == 100)
    assert(resumed.select(countDistinct(col("id"))).head().getLong(0) == 100)
    // no staging leftovers
    val leftovers = new java.io.File(s"$dir/out").listFiles().map(_.getName).filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging dirs not cleaned: ${leftovers.toSeq}")
  }

  test("crash mid-chunk during an UPDATE: committed chunks carry the update, resume equals the batch rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("cow-upd-crash").toString
    val src = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "price")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")

    def update(chunk: org.apache.spark.sql.DataFrame) =
      chunk.withColumn("price",
        when(col("id") % 2 === 0, col("price") * 2).otherwise(col("price")))

    val cfg = cfg0.copy(retryAttempts = 1)
    intercept[RuntimeException] {
      ChunkedRewrite.rewrite(table, "id", cfg, s"$dir/out") { chunk =>
        if (chunk.filter(col("id") === 60).count() > 0)
          throw new RuntimeException("killed mid-update")
        update(chunk)
      }
    }
    // Committed chunks are fully UPDATED, uncommitted ids absent — never a
    // chunk with half-original half-updated rows.
    val afterCrash = ChunkedRewrite.readBackCommitted(spark, s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(afterCrash.keySet.forall(_ <= 50))
    afterCrash.foreach { case (id, price) =>
      assert(price == (if (id % 2 == 0) id * 2.0 else id.toDouble),
        s"committed chunk holds a non-updated row: $id -> $price")
    }

    // Resume idempotently; the final table equals the one-shot batch update.
    ChunkedRewrite.rewrite(table, "id", cfg, s"$dir/out")(update)
    val resumed = ChunkedRewrite.readBackCommitted(spark, s"$dir/out")
    assert(resumed.count() == 100)
    val expectedSum = (1L to 100L).map(i => if (i % 2 == 0) i * 2.0 else i.toDouble).sum
    assert(resumed.select(sum(col("price"))).head().getDouble(0) == expectedSum)
  }

  test("chunked MERGE via rewriteWithRange: updates and inserts each land exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("cow-merge").toString
    val src = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "price")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")
    // delta: double the price of multiples of 10, insert ids 101..110
    val updates = (Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L))
      .map(i => (i, i * 2.0)).toDF("u_id", "u_price")
    val inserts = (101L to 110L).map(i => (i, i.toDouble)).toDF("id", "price")

    ChunkedRewrite.rewriteWithRange(table, "id", cfg0, s"$dir/out",
      rangeDf = Some(table.select(col("id")).unionByName(inserts.select(col("id"))))) {
      (chunk, chunkDf) =>
        val lo = lit(chunk.start.toLong); val hi = lit(chunk.end.toLong)
        chunkDf.join(updates.filter(col("u_id").between(lo, hi)),
            chunkDf("id") === col("u_id"), "left")
          .withColumn("price", when(col("u_id").isNotNull, col("u_price")).otherwise(col("price")))
          .drop("u_id", "u_price")
          .unionByName(inserts.filter(col("id").between(lo, hi)))
    }
    val result = ChunkedRewrite.readBackCommitted(spark, s"$dir/out")
    assert(result.count() == 110)
    assert(result.select(countDistinct(col("id"))).head().getLong(0) == 110) // no key twice
    val expectedSum = (1L to 100L).map(i => if (i % 10 == 0) i * 2.0 else i.toDouble).sum +
      (101L to 110L).map(_.toDouble).sum
    assert(result.select(sum(col("price"))).head().getDouble(0) == expectedSum)
    // the insert keys walked ranges past the target's own max — rangeDf at work
    assert(result.select(max(col("id"))).head().getLong(0) == 110)
  }

  test("pinLocal pins a tiny frame but refuses a corpus-sized one with a clear error") {
    val small = (1L to 10L).toDF("id")
    val pinned = ChunkedRewrite.pinLocal(small)
    assert(pinned.count() == 10)
    assert(pinned.select(sum(col("id"))).head().getLong(0) == 55L)

    // A non-aggregating "audit" over a big frame must fail loudly at the cap,
    // not OOM the driver silently.
    val big = spark.range(1, 1001).toDF("id")
    val e = intercept[IllegalArgumentException] {
      ChunkedRewrite.pinLocal(big, maxRows = 100)
    }
    assert(e.getMessage.contains("not control-plane-sized"))
  }

  test("readBackCommitted skips a torn non-atomic rename (data present, marker absent)") {
    val dir = java.nio.file.Files.createTempDirectory("cow-torn").toString
    val src = (1L to 100L).toDF("id")
    src.write.mode("overwrite").parquet(s"$dir/src")
    val table = spark.read.parquet(s"$dir/src")
    ChunkedRewrite.rewrite(table, "id", cfg0, s"$dir/out")(chunk => chunk)

    // Simulate an object-store crash mid-"rename": the chunk dir exists with
    // readable data files (copy+delete got partway) but the marker — written
    // strictly last — never landed.
    (101L to 125L).toDF("id").write.parquet(s"$dir/out/chunk_101_125")

    // The glob reader would happily ingest the torn chunk...
    assert(ChunkedRewrite.readBack(spark, s"$dir/out").count() == 125)
    // ...the committed reader skips it.
    val committed = ChunkedRewrite.readBackCommitted(spark, s"$dir/out")
    assert(committed.count() == 100)
    assert(committed.select(max(col("id"))).head().getLong(0) == 100)
  }
}
