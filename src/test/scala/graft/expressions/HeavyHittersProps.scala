package graft.expressions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving invariants under RANDOM streams, random capacities, random
  * partition splits and random merge orders — the pure-expression twin of
  * HeavyHittersSpec's executed-plan cases. The model is exact counting.
  */
object HeavyHittersProps extends Properties("HeavyHitters") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private def agg(m: Int) =
    HeavyHitters(BoundReference(0, StringType, nullable = true), Literal(m, IntegerType))

  /** run the aggregate over `chunks` as independent partial buffers merged
    * in the given order, returning (item -> (cnt, err)) plus output order
    */
  private def run(m: Int, chunks: Seq[Seq[String]]): Seq[(String, Long, Long)] = {
    val a = agg(m)
    val partials = chunks.map { chunk =>
      val b = a.createAggregationBuffer()
      chunk.foreach(s => a.update(b, InternalRow(UTF8String.fromString(s))))
      // exercise the wire format on the way
      a.deserialize(a.serialize(b))
    }
    val merged = partials.reduceLeft(a.merge)
    val out = a.eval(merged).asInstanceOf[ArrayData]
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
  }

  private val genCase = for {
    alphabet <- Gen.choose(1, 30)
    n <- Gen.choose(1, 400)
    // zipf-ish skew: item k chosen with weight ~ 1/(k+1)
    items <- Gen.listOfN(n, Gen.frequency(
      (0 until alphabet).map(k => (alphabet - k, Gen.const(s"w$k"))): _*))
    m <- Gen.choose(1, 40)
    nChunks <- Gen.choose(1, 7)
    cuts <- Gen.listOfN(nChunks - 1, Gen.choose(0, items.size))
  } yield {
    val bounds = (0 +: cuts.sorted :+ items.size).distinct.sorted
    val chunks = bounds.zip(bounds.tail).map { case (s, e) => items.slice(s, e) }
    (items, m, chunks.filter(_.nonEmpty).toSeq match {
      case Seq() => Seq(items) // all cuts degenerate
      case cs => cs
    })
  }

  property("exact regime (m >= distinct): counts exact, errs zero, any split") =
    forAll(genCase) { case (items, m0, chunks) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val m = math.max(m0, truth.size) // force the exact regime
      val got = run(m, chunks)
      got.size == truth.size &&
        got.forall { case (it, cnt, err) => err == 0L && truth(it) == cnt }
    }

  // NoShrink: scalacheck's tuple shrinker ignores the generator's m >= 1
  // contract and "falsifies" with m = 0 artifacts
  property("sequential (one chunk): cnt overestimates, err covers it, error <= N/m") =
    forAllNoShrink(genCase) { case (items, m, _) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      val got = run(m, Seq(items))
      got.forall { case (it, cnt, err) =>
        val t = truth.getOrElse(it, 0L)
        cnt >= t && cnt - err <= t && cnt - t <= n / m
      }
    }

  // The merged regime's honest contract. Twice refined by falsification:
  // round 11 killed "cnt >= true under merging" (a partition's summary
  // that evicted an item contributes none of its occurrences), and round
  // 18 killed the plain keep-m-largest prune's "two-sided N/m band" (a
  // DROPPED counter's whole mass vanished — seed kept as a regression
  // case in HeavyHittersSpec). The merge now uses the PODS'12 Misra-Gries
  // pivot prune, whose certifiable claims are asserted here:
  //   lower = cnt − err never overestimates; its undershoot <= n/m;
  //   |cnt − true| <= 2n/m; heavy items (true > n/m) present; size <= m.
  property("merged (any split): interval invariant, 2N/m band, heavy items present, ordered") =
    forAllNoShrink(genCase) { case (items, m, chunks) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      val got = run(m, chunks)
      val bySize = got.size <= m
      val bounds = got.forall { case (it, cnt, err) =>
        val t = truth.getOrElse(it, 0L)
        val lower = cnt - err
        lower <= t && t - lower <= n / m && math.abs(cnt - t) <= 2 * n / m
      }
      val present = truth.filter(_._2 > n / m).keys.forall(k => got.exists(_._1 == k))
      val ordered = got.sortBy { case (it, cnt, _) => (-cnt, it) } == got
      bySize && bounds && present && ordered
    }

  property("merge order cannot change the exact-regime result") =
    forAll(genCase) { case (items, _, chunks) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val m = truth.size + 3
      run(m, chunks) == run(m, chunks.reverse)
    }
}
