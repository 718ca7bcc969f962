package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r18): reproduce the dml_chunked_update_par latch stall and
  * dump SYSCS_DIAG.LOCK_TABLE while it is stalled, to see which statement
  * is blocked on whose lock. Usage: Test/runMain graft.tools.DerbyLockProbe <sfDir>
  */
object DerbyLockProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = "lockprobe_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    val props = new java.util.Properties
    spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
      .coalesce(4).write.option("batchsize", "10000").jdbc(url, "part_live", props)
    locally {
      val c = java.sql.DriverManager.getConnection(url, props)
      c.createStatement().executeUpdate("""CREATE INDEX part_live_key ON part_live ("p_partkey")""")
      val ps = c.prepareStatement("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(?, ?)")
      ps.setString(1, "derby.locks.escalationThreshold"); ps.setString(2, "1000000")
      ps.execute(); ps.close(); c.close()
    }
    val c0 = java.sql.DriverManager.getConnection(url, props)
    val rs0 = c0.createStatement().executeQuery(
      """SELECT MIN("p_partkey"), MAX("p_partkey") FROM part_live""")
    rs0.next(); val mn = rs0.getLong(1); val mx = rs0.getLong(2); c0.close()
    val step = (mx - mn) / 8 + 1
    val latch = new java.util.concurrent.CountDownLatch(7)
    val threads = (0 until 8).map { i =>
      val lo = mn + i * step; val hi = math.min(mx, lo + step - 1)
      new Thread(() => {
        val t0 = System.nanoTime()
        val c = java.sql.DriverManager.getConnection(url, props)
        c.setAutoCommit(false)
        val st = c.createStatement()
        val tU0 = System.nanoTime()
        st.executeUpdate(
          s"""UPDATE part_live SET "p_retailprice" = "p_retailprice" * 1.04 """ +
            s"""WHERE "p_size" <= 25 AND "p_partkey" BETWEEN $lo AND $hi""")
        val tU1 = System.nanoTime()
        println(f"worker $i conn=${(tU0 - t0) / 1e9}%.2f update=${(tU1 - tU0) / 1e9}%.2f s")
        if (i == 0) {
          val ok = latch.await(8, java.util.concurrent.TimeUnit.SECONDS)
          println(s"worker 0 latch ok=$ok")
          c.rollback()
        } else {
          latch.countDown()
          c.commit()
        }
        c.close()
      })
    }
    threads.foreach(_.start())
    Thread.sleep(4000)
    // Dump the lock table mid-stall (if any).
    val cd = java.sql.DriverManager.getConnection(url, props)
    val rs = cd.createStatement().executeQuery(
      "SELECT XID, TYPE, MODE, TABLENAME, LOCKNAME, STATE, TABLETYPE, LOCKCOUNT FROM SYSCS_DIAG.LOCK_TABLE ORDER BY TABLENAME, STATE")
    var waits = 0
    while (rs.next()) {
      val state = rs.getString(6)
      if (state == "WAIT") waits += 1
      if (state == "WAIT" || waits < 3)
        println(s"LOCK xid=${rs.getString(1)} type=${rs.getString(2)} mode=${rs.getString(3)} " +
          s"tbl=${rs.getString(4)} name=${rs.getString(5)} state=$state n=${rs.getString(8)}")
    }
    println(s"WAITING LOCKS: $waits")
    cd.close()
    threads.foreach(_.join())
    spark.stop()
  }
}
