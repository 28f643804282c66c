package graft.kernels

import graft.kernels.SegmentAlgebra._
import org.scalatest.funsuite.AnyFunSuite

class SegmentAlgebraSpec extends AnyFunSuite {

  private def ts(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000L

  private def seg(id: Option[Long], series: Long, v: String, s: String, e: String) =
    Seg(id, series, Some(v), ts(s), ts(e))

  // mirrors reference test "identical qualifier segments merge without
  // affecting other types" (tests/testthat/test-adjust_functions.R:13)
  test("merge: same-value overlap merges keeping existing id; other values untouched") {
    val segments = Seq(
      seg(None, 183L, "18", "2024-06-07 07:00:00", "2024-07-31 19:45:00"),
      seg(Some(30L), 183L, "18", "2023-09-13 16:00:00", "2025-10-28 12:30:00"),
      seg(Some(40L), 183L, "1", "2024-10-19 11:15:00", "2025-01-01 22:00:00"),
      seg(None, 183L, "1", "2025-05-08 08:00:00", "2025-10-28 10:45:00")
    )
    val (merged, deleteIds) = mergeOverlappingSameValue(segments)
    assert(merged.length == 3)
    assert(deleteIds.isEmpty)
    val t18 = merged.filter(_.value.contains("18"))
    assert(t18.length == 1)
    assert(t18.head.id.contains(30L))
    assert(t18.head.startDt == ts("2023-09-13 16:00:00"))
    assert(t18.head.endDt == ts("2025-10-28 12:30:00"))
    assert(merged.count(_.value.contains("1")) == 2)
  }

  // mirrors "merging qualifier segments reports redundant existing IDs"
  // (test-adjust_functions.R:66)
  test("merge: redundant existing ids reported for deletion") {
    val segments = Seq(
      seg(Some(10L), 183L, "18", "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
      seg(Some(11L), 183L, "18", "2024-02-01 00:00:00", "2024-04-01 00:00:00")
    )
    val (merged, deleteIds) = mergeOverlappingSameValue(segments)
    assert(merged.length == 1)
    assert(merged.head.id.contains(10L))
    assert(merged.head.startDt == ts("2024-01-01 00:00:00"))
    assert(merged.head.endDt == ts("2024-04-01 00:00:00"))
    assert(deleteIds == Seq(11L))
  }

  test("collapse: new segments split and override existing; ids reused positionally") {
    val exist = Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val news = Seq(seg(None, 7L, "B", "2024-01-03 00:00:00", "2024-01-05 00:00:00"))
    val out = collapseSegmentsWithSplit(exist, news, 7L)
    assert(out.map(s => (s.value.get, s.startDt, s.endDt)) == Seq(
      ("A", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("B", ts("2024-01-03 00:00:00"), ts("2024-01-05 00:00:00")),
      ("A", ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"))
    ))
    assert(out.head.id.contains(1L)) // first rebuilt row reuses the existing id
    assert(out(1).id.isEmpty && out(2).id.isEmpty)
  }

  test("collapse: same-value new segment extends and merges seamlessly") {
    val exist = Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val news = Seq(seg(None, 7L, "A", "2024-01-10 00:00:00", "2024-01-15 00:00:00"))
    val out = collapseSegmentsWithSplit(exist, news, 7L)
    assert(out == Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-15 00:00:00")))
  }

  test("collapse: surplus existing rows become deletion sentinels") {
    val exist = Seq(
      seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-05 00:00:00"),
      seg(Some(2L), 7L, "B", "2024-01-05 00:00:00", "2024-01-10 00:00:00")
    )
    // new segment covers everything with one value -> 1 final segment
    val news = Seq(seg(None, 7L, "C", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val out = collapseSegmentsWithSplit(exist, news, 7L)
    assert(out.length == 2)
    assert(out.head.value.contains("C") && out.head.id.contains(1L))
    assert(out(1).seriesId == -1L && out(1).id.contains(2L))
  }

  test("collapse: bridge_latest_extension stretches same-value latest segment across a gap") {
    val exist = Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-05 00:00:00"))
    val news = Seq(seg(None, 7L, "A", "2024-01-08 00:00:00", "2024-01-12 00:00:00"))
    val bridged = collapseSegmentsWithSplit(exist, news, 7L, bridgeLatestExtension = true)
    assert(bridged == Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-12 00:00:00")))
    val unbridged = collapseSegmentsWithSplit(exist, news, 7L, bridgeLatestExtension = false)
    assert(unbridged.map(_.startDt) == Seq(ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")))
  }

  test("adjust: idempotence short-circuit returns None") {
    val exist = Seq(seg(Some(1L), 7L, "A", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val news = Seq(seg(None, 7L, "A", "2024-01-02 00:00:00", "2024-01-03 00:00:00"))
    assert(SegmentAlgebra.adjust(exist, news, 7L).isEmpty)
    val changing = Seq(seg(None, 7L, "B", "2024-01-02 00:00:00", "2024-01-03 00:00:00"))
    assert(SegmentAlgebra.adjust(exist, changing, 7L).isDefined)
  }
}
