package graft.ops

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Process-scoped scratch directories for the runner-backed catalog
  * entries (staged micro-batch corpora, checkpoints, batch_id sinks, DML
  * COW output dirs).
  *
  * These entries return a DataFrame that lazily READS from a sink inside
  * the work dir, so the dir cannot be deleted when the entry returns — the
  * caller (Verify, Bench, a spec, a user) scans it afterwards. What CAN be
  * guaranteed is that no dir outlives the process: every dir handed out
  * here is registered once with a JVM shutdown hook and deleted at exit.
  * Before this, every verify/bench invocation leaked its work dirs into
  * the temp filesystem permanently — repeated runs accumulated unbounded
  * disk.
  *
  * Deletion failures at exit are swallowed (best effort): the JVM is going
  * down, Spark's own shutdown hooks are concurrently removing ITS temp
  * dirs, and a half-removed scratch dir costs disk, not correctness.
  */
private[graft] object Scratch {

  private val dirs = new ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => drain(), "graft-scratch-cleanup"))

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  private def drain(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      try deleteTree(p) catch { case _: Exception => () }
      p = dirs.poll()
    }
  }

  private def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      val st = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toVector.sortBy(_.toString).reverse.foreach { f =>
          try Files.deleteIfExists(f) catch { case _: java.io.IOException => () }
        }
      } finally st.close()
    }
}
