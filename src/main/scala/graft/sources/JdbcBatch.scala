package graft.sources

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.chunker._

/** Chunked JDBC source/sink — the reference's home turf (a live RDBMS,
  * reference lib/DBIx/BatchChunker.pm:70-89) mapped onto Spark's JDBC
  * connector:
  *
  *  - READ: discover `[min, max]` with one MIN/MAX roundtrip (the
  *    reference's `calculate_ranges` against `min_stmt`/`max_stmt`,
  *    lib/DBIx/BatchChunker.pm:1019-1093), plan id-range chunks, and hand
  *    Spark ONE `BETWEEN` predicate per chunk — `spark.read.jdbc(url, table,
  *    predicates, ...)` turns each chunk into its own partition, so the scan
  *    parallelizes across executors with each task reading exactly one
  *    chunk's slice (index-range scan DB-side).
  *  - WRITE: the reference's lock-friendly DML path — each id-range chunk is
  *    appended in its own driver-sequenced batch with the configured `sleep`
  *    between chunks (replica breathing room, lib/DBIx/BatchChunker.pm:596-614)
  *    and per-chunk retry.
  *
  * The semantic difference from the reference is deliberate and documented:
  * chunks in the READ path run CONCURRENTLY (Spark partitions), because a
  * read holds no locks — sequencing only matters for writes, where we keep
  * the reference's strict chunk-at-a-time order.
  */
object JdbcBatch {

  /** ANSI-quoted identifier — matches how Spark's JDBC dialects create
    * columns (case-sensitive), so `id` written by Spark stays addressable. */
  private def quoted(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** One-roundtrip range discovery over JDBC (no Spark job). */
  def discoverRange(url: String, table: String, idColumn: String, props: Properties = new Properties): Option[(BigInt, BigInt)] = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MIN(${quoted(idColumn)}), MAX(${quoted(idColumn)}) FROM $table")
      if (!rs.next()) None
      else {
        val mn = rs.getBigDecimal(1)
        val mx = rs.getBigDecimal(2)
        if (mn == null || mx == null) None
        else Some((BigInt(mn.toBigInteger), BigInt(mx.toBigInteger)))
      }
    } finally conn.close()
  }

  /** Chunk-partitioned parallel JDBC read: one Spark partition per planned
    * chunk, each bounded by a sargable BETWEEN predicate.
    */
  def readChunked(
      spark: SparkSession,
      url: String,
      table: String,
      idColumn: String,
      cfg: ChunkerConfig,
      props: Properties = new Properties
  ): DataFrame = {
    val engine = new ChunkEngine(cfg, None, None)
    discoverRange(url, table, idColumn, props).foreach { case (mn, mx) =>
      engine.minId = Some(mn); engine.maxId = Some(mx)
    }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    engine.execute(c => chunks += c, markTimerOnDispatch = false)
    if (chunks.isEmpty)
      return spark.read.jdbc(url, table, props).limit(0)
    val predicates = chunks.map(c => s"${quoted(idColumn)} BETWEEN ${c.start} AND ${c.end}").toArray
    spark.read.jdbc(url, table, predicates, props)
  }

  /** Strictly-sequential chunked JDBC append: the reference's "run large
    * database changes safely" write path. Returns the execution report
    * (resume point usable for a re-run after failure).
    */
  def writeChunked(
      df: DataFrame,
      idColumn: String,
      cfg: ChunkerConfig,
      url: String,
      table: String,
      props: Properties = new Properties
  ): ExecutionReport = {
    val bc = new BatchChunker(df, idColumn, cfg)
    bc.calculateRanges()
    bc.foreachChunk { chunk =>
      chunk.write.mode("append").jdbc(url, table, props)
    }
  }
}
