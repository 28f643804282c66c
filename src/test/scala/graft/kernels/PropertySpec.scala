package graft.kernels

import graft.functions.PeriodFormat
import graft.kernels.SegmentAlgebra._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the pure kernels — the invariants SURVEY §5
  * flags as worth property-testing (non-overlapping segments,
  * non-negative increments, period round-trips).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("PeriodFormat: toSeconds . fromSeconds is identity for whole-second periods") {
    check(Prop.forAll(Gen.choose(1L, 400L * 86400L)) { secs =>
      PeriodFormat.toSeconds(PeriodFormat.fromSeconds(secs)).contains(secs)
    })
  }

  private val segGen: Gen[List[Seg]] = for {
    n <- Gen.choose(0, 6)
    segs <- Gen.listOfN(
      n,
      for {
        start <- Gen.choose(0L, 50L)
        len <- Gen.choose(1L, 20L)
        v <- Gen.oneOf("A", "B", "C")
      } yield Seg(None, 7L, Some(v), start * 3600000000L, (start + len) * 3600000000L)
    )
  } yield segs

  /** Carve arbitrary segments into a valid non-overlapping existing state. */
  private val nonOverlappingGen: Gen[List[Seg]] =
    segGen.map { segs =>
      val sorted = segs.sortBy(_.startDt)
      var cursor = Long.MinValue
      var id = 0L
      sorted.flatMap { s =>
        val st = math.max(s.startDt, cursor)
        if (st >= s.endDt) None
        else {
          cursor = s.endDt
          id += 1
          Some(s.copy(id = Some(id), startDt = st))
        }
      }
    }

  test("SegmentAlgebra.adjust: result segments never overlap and have positive length") {
    check(Prop.forAll(nonOverlappingGen, segGen) { (exist, news) =>
      news.isEmpty || {
        SegmentAlgebra.adjust(exist, news, 7L) match {
          case None => true
          case Some((segs, _)) =>
            val live = segs.filter(_.seriesId != -1L).sortBy(_.startDt)
            val noOverlap = live.sliding(2).forall {
              case Seq(a, b) => a.endDt <= b.startDt
              case _         => true
            }
            noOverlap && live.forall(s => s.startDt < s.endDt)
        }
      }
    })
  }

  test("SegmentAlgebra.adjust: non-overlapping new segments' values win in their range") {
    check(Prop.forAll(nonOverlappingGen, segGen) { (exist, news0) =>
      val news = news0.sortBy(_.startDt).foldLeft(List.empty[Seg]) { (acc, s) =>
        if (acc.exists(o => s.startDt < o.endDt && o.startDt < s.endDt)) acc else s :: acc
      }
      news.isEmpty || {
        def covered(live: Seq[Seg]) = news.forall { n =>
          val mid = (n.startDt + n.endDt) / 2
          live.exists(s => s.startDt <= mid && mid < s.endDt && s.value == n.value)
        }
        SegmentAlgebra.adjust(exist, news, 7L) match {
          case None             => covered(exist)
          case Some((segs, _)) => covered(segs.filter(_.seriesId != -1L))
        }
      }
    })
  }

  test("SegmentAlgebra.adjust is idempotent: re-adjusting the result is a no-op") {
    check(Prop.forAll(nonOverlappingGen, segGen) { (exist, news) =>
      news.isEmpty || {
        SegmentAlgebra.adjust(exist, news, 7L) match {
          case None => true
          case Some((segs, _)) =>
            val live = segs.filter(_.seriesId != -1L)
            // applying the SAME new segments to the new state changes nothing
            SegmentAlgebra.adjust(live, news, 7L).isEmpty
        }
      }
    })
  }

  test("IncrementKernel: increments are never negative") {
    val valsGen = for {
      n <- Gen.choose(2, 40)
      vs <- Gen.listOfN(n, Gen.choose(0.0, 100.0))
    } yield vs.toArray
    check(Prop.forAll(valsGen) { vs =>
      val dts = Array.tabulate(vs.length)(i => 1672531200L + i * 3600L)
      val (_, inc) = IncrementKernel.computeIncrements(dts, vs, resetDrop = 20.0, minPos = 0.0)
      inc.flatten.forall(_ >= 0.0)
    })
  }
}
