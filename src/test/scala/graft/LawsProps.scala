package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.functions.{Aggs, VectorOps}

/** ScalaCheck laws for the pure (driver-side) kernels — the properties
  * SURVEY.md §5.2 item 3 commits to. Spark-level laws live in OpsSpec;
  * these cover the deterministic primitives with generated inputs. */
object LawsProps extends Properties("graft.laws") {

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val words: Gen[List[String]] = Gen.listOfN(50, word)

  property("cmsBucket lands in [0, width) for every row") = forAll(word) { w =>
    (0 until Aggs.CmsDepth).forall { d =>
      val b = Aggs.cmsBucket(d, w); b >= 0 && b < Aggs.CmsWidth
    }
  }

  property("cmsBuckets is deterministic (memoized path == fresh path)") =
    forAll(word) { w =>
      Aggs.cmsBuckets(w).toSeq == Aggs.cmsBuckets(w).toSeq
    }

  property("CMS reduce is permutation-invariant") = forAll(words) { ws =>
    val agg = new Aggs.CountMinAgg
    def build(xs: List[String]) = xs.foldLeft(agg.zero)(agg.reduce).toSeq
    build(ws) == build(scala.util.Random.shuffle(ws))
  }

  property("CMS merge == elementwise sum of independent builds") =
    forAll(words, words) { (xs, ys) =>
      val agg = new Aggs.CountMinAgg
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = ys.foldLeft(agg.zero)(agg.reduce)
      val sum = a.clone().zip(b).map { case (x, y) => x + y }.toSeq
      agg.merge(a, b).toSeq == sum
    }

  property("CMS estimate >= true count (overestimate-only)") = forAll(words) { ws =>
    val agg = new Aggs.CountMinAgg
    val buf = ws.foldLeft(agg.zero)(agg.reduce)
    ws.distinct.forall { w =>
      val truth = ws.count(_ == w)
      val est = (0 until Aggs.CmsDepth)
        .map(d => buf(d * Aggs.CmsWidth + Aggs.cmsBucket(d, w))).min
      est >= truth
    }
  }

  property("LSH hyperplane components lie in [-1, 1]") = Prop(
    VectorOps.planes.flatten.forall(v => v >= -1.0 && v <= 1.0))

  property("batchIterator == materializing grouped() reference") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(1L, 30L)))) { counts =>
      // build a key-sorted run: for each (key, n) pair, n occurrences
      val keys = counts.flatMap { case (k, n) => List.fill(n.toInt)(k) }
        .sorted
      val got = graft.functions.Batching.batchIterator(keys.iterator, 10).toList
      val want = keys.groupBy(identity).toList.sortBy(_._1).flatMap { case (k, ks) =>
        ks.grouped(10).zipWithIndex.map { case (b, i) => (k, i.toLong, b.size.toLong) }
      }
      got == want
    }

  property("batchIterator emits every element exactly once") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 3L))) { raw =>
      val keys = raw.sorted
      val got = graft.functions.Batching.batchIterator(keys.iterator, 7).toList
      got.map(_._3).sum == keys.size &&
        got.groupBy(_._1).forall { case (k, bs) =>
          bs.map(_._2).sorted == bs.indices.map(_.toLong)
        }
    }

  property("argmax CombineFn is merge-order independent") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 999L)))) { xs =>
      xs.nonEmpty ==> {
        val agg = new Aggs.ArgMaxByValue
        val l = xs.foldLeft(agg.zero)(agg.reduce)
        val (a, b) = xs.splitAt(xs.length / 2)
        val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        agg.finish(l) == agg.finish(m)
      }
    }
}
