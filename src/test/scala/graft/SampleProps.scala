package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.SampleFunctions
import graft.functions.SampleFunctions.{WsBuf, WsEntry}

/** Property-based checks of the weighted-reservoir algebra: the bounded
  * top-k buffer must produce EXACTLY the true top-k of all inputs under
  * ANY split of the input into partitions and any merge tree — the law
  * that licenses running it as map-side partials in a distributed
  * aggregation and as a streaming state merge
  * ([[graft.streaming.StreamWeightedSample]]). The 2k compaction bound
  * is what makes the state bounded; these properties show boundedness
  * never costs exactness.
  */
object SampleProps extends Properties("weightedTopK") {

  private val k = 5
  private val agg = SampleFunctions.weightedTopK(k)

  // small priority range on purpose: collisions in pri exercise the
  // id tiebreak; distinct ids (indexed) keep the total order total
  private val entriesGen: Gen[List[WsEntry]] =
    Gen.listOf(Gen.chooseNum(0, 30)).map(_.zipWithIndex.map {
      case (p, i) => WsEntry(p / 7.0, i.toLong)
    })

  private def trueTopK(es: Seq[WsEntry]): Seq[WsEntry] =
    es.sortBy(e => (-e.pri, e.id)).take(k)

  private def reduceAll(es: Seq[WsEntry]): WsBuf =
    es.foldLeft(agg.zero)(agg.reduce)

  property("sequential reduce equals the true top-k") = forAll(entriesGen) { es =>
    agg.finish(reduceAll(es)) == trueTopK(es)
  }

  property("any 3-way split + merge equals the true top-k") =
    forAll(entriesGen, Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) { (es, a, b) =>
      val (cut1, cut2) =
        if (es.isEmpty) (0, 0)
        else {
          val c = List(a % (es.length + 1), b % (es.length + 1)).sorted
          (c(0), c(1))
        }
      val parts = List(es.take(cut1), es.slice(cut1, cut2), es.drop(cut2))
      // left-leaning and right-leaning merge trees must agree
      val left = agg.finish(parts.map(reduceAll).reduce(agg.merge))
      val right = agg.finish(parts.map(reduceAll).reduceRight(agg.merge))
      left == trueTopK(es) && right == trueTopK(es)
    }

  property("buffer never exceeds 2k entries after any reduce/merge step") =
    forAll(entriesGen) { es =>
      val buf = reduceAll(es)
      val merged = agg.merge(buf, reduceAll(es.reverse))
      buf.entries.length <= 2 * k && merged.entries.length <= 2 * k
    }

  property("finish is k-bounded and ordered by (pri desc, id asc)") =
    forAll(entriesGen) { es =>
      val out = agg.finish(reduceAll(es))
      out.length <= k &&
        out.sliding(2).forall {
          case Seq(x, y) => x.pri > y.pri || (x.pri == y.pri && x.id < y.id)
          case _ => true
        }
    }
}
