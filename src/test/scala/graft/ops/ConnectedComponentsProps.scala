package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** Property: on arbitrary random graphs, both CC paths (single-task
  * union-find and the distributed Pregel loop) produce exactly the labels
  * of a trivial in-test reference implementation. */
object ConnectedComponentsProps extends Properties("ConnectedComponents") {
  private lazy val spark = SparkTestSession.spark

  /** Naive driver-side CC: repeated global min propagation to fixpoint. */
  private def referenceCc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    pairs.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = scala.collection.mutable.Map(adj.keys.map(k => k -> k).toSeq: _*)
    var changed = true
    while (changed) {
      changed = false
      adj.foreach { case (v, ns) =>
        val m = (label(v) :: ns.map(label)).min
        if (m < label(v)) { label(v) = m; changed = true }
      }
    }
    label.toMap
  }

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)        // node universe
    m <- Gen.choose(1, 60)        // edge count
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges.filter { case (a, b) => a != b }

  // few cases on purpose: each case runs Spark jobs; the shrunken fixture
  // suite in DedupClustersSpec covers the deterministic corners.
  property("both paths equal the naive reference on random graphs") =
    forAll(graphGen) { edges =>
      edges.isEmpty || {
        import spark.implicits._
        val expect = referenceCc(edges)
        val df = edges.toDF("doc_a", "doc_b")
        Seq(0L, Long.MaxValue).forall { thr =>
          val got = Dedup.connectedComponents(df, smallGraphThreshold = thr)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          got == expect
        }
      }
    }

  // keep the Spark-backed property cheap
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)
}
