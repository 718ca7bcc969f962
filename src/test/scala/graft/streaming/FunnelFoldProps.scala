package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.streaming.EventStream.{foldFunnel, FunnelState}

/** Properties of the pure funnel fold against the declarative definition
  * (t1 = min view; t2 = min click strictly after t1; t3 = min purchase
  * strictly after t2), plus the incremental-replay law that makes the
  * cross-batch streaming fold equal the batch window: folding a sorted
  * sequence in arbitrary contiguous chunks equals folding it whole.
  */
object FunnelFoldProps extends Properties("FunnelFold") {

  private val empty = FunnelState(-1L, -1L, -1L)
  private val genEvents: Gen[List[(Long, String)]] =
    Gen.listOf(for {
      m <- Gen.chooseNum(0L, 40L) // small domain to force ties
      t <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (m, t)).map(_.sortBy(_._1))

  private def declarative(ev: Seq[(Long, String)]): FunnelState = {
    val t1 = ev.collect { case (m, "view") => m }.minOption.getOrElse(-1L)
    val t2 = if (t1 < 0) -1L
      else ev.collect { case (m, "click") if m > t1 => m }.minOption.getOrElse(-1L)
    val t3 = if (t2 < 0) -1L
      else ev.collect { case (m, "purchase") if m > t2 => m }.minOption.getOrElse(-1L)
    FunnelState(t1, t2, t3)
  }

  property("fold over a time-ordered stream equals the declarative definition") =
    forAll(genEvents) { ev => foldFunnel(empty, ev) == declarative(ev) }

  property("chunked incremental replay equals one-shot fold (any split points)") =
    forAll(genEvents, Gen.chooseNum(1, 5)) { (ev, k) =>
      val chunks = if (ev.isEmpty) Seq(ev) else ev.grouped(math.max(1, ev.size / k)).toSeq
      chunks.foldLeft(empty)(foldFunnel) == foldFunnel(empty, ev)
    }

  property("transition fold: chunked emission with carried state equals the pairwise zip") =
    forAll(genEvents, Gen.chooseNum(1, 5)) { (ev, k) =>
      val types = ev.map(_._2)
      val chunks = if (types.isEmpty) Seq(types) else types.grouped(math.max(1, types.size / k)).toSeq
      val (chunked, lastState) = chunks.foldLeft(
          (Seq.empty[(String, String)], Option.empty[String])) {
        case ((acc, prev), chunk) =>
          val (out, next) = EventStream.foldTransitions(prev, chunk)
          (acc ++ out, next)
      }
      chunked == types.zip(types.drop(1)) && lastState == types.lastOption
    }
}
