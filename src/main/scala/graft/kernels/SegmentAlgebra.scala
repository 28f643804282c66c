package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** Interval (QC-segment) maintenance algebra: non-overlapping
  * half-open `[start, end)` value segments maintained by
  * split/merge/bridge operations.
  *
  * Behavioral parity with `R/adjust_functions.R` (YukonWRB/AquaCache):
  *   - `collapseSegmentsWithSplit` (`:18-149`): union all boundary
  *     instants of existing + new segments, rebuild unit intervals
  *     (new wins over old), merge adjacent same-value intervals,
  *     reuse existing ids positionally, mark surplus existing rows
  *     for deletion with sentinel seriesId = -1;
  *     `bridgeLatestExtension` (`:37-56`) stretches the latest
  *     existing segment to the first new one when values match
  *     across a gap;
  *   - `mergeOverlappingSameValue` (`:162-250`): merge overlapping or
  *     touching same-value segments preserving ids where possible,
  *     returning redundant ids for deletion;
  *   - `stateKey` (`:260-303`): canonical state fingerprint for
  *     idempotence checks before writing.
  *
  * Overlapping DIFFERENT-type segments (qualifier "rank streams",
  * reference test `test-adjust_functions.R:90`) are handled by keying
  * streams on (series, type) — each stream is independently
  * non-overlapping.
  */
object SegmentAlgebra {

  /** One segment; times are epoch micros; `seriesId = -1` marks a
    * row scheduled for deletion.
    */
  final case class Seg(
      id: Option[Long],
      seriesId: Long,
      value: Option[String],
      startDt: Long,
      endDt: Long
  )

  def collapseSegmentsWithSplit(
      exist0: Seq[Seg],
      newSegments0: Seq[Seg],
      seriesId: Long,
      bridgeLatestExtension: Boolean = false
  ): Seq[Seg] = {
    if (newSegments0.isEmpty) return exist0
    var exist = exist0.sortBy(s => (s.startDt, s.endDt))
    val newSegments = newSegments0.sortBy(s => (s.startDt, s.endDt))

    if (bridgeLatestExtension && exist.nonEmpty) {
      val latestIdx = exist.indices.maxBy(i => exist(i).endDt)
      val firstNew = newSegments.minBy(_.startDt)
      val latest = exist(latestIdx)
      if (latest.endDt < firstNew.startDt && latest.value == firstNew.value)
        exist = exist.updated(latestIdx, latest.copy(endDt = firstNew.startDt))
    }

    val boundaries =
      (exist.flatMap(s => Seq(s.startDt, s.endDt)) ++
        newSegments.flatMap(s => Seq(s.startDt, s.endDt))).distinct.sorted

    val rebuilt = ArrayBuffer.empty[(Long, Long, Option[String])]
    var i = 0
    while (i < boundaries.length - 1) {
      val startI = boundaries(i)
      val endI = boundaries(i + 1)
      if (startI < endI) {
        val newMatch = newSegments.find(s => s.startDt <= startI && s.endDt >= endI)
        val value = newMatch match {
          case Some(s) => s.value
          case None =>
            exist.find(s => s.startDt <= startI && s.endDt >= endI).flatMap(_.value)
        }
        if (value.isDefined) rebuilt += ((startI, endI, value))
      }
      i += 1
    }
    if (rebuilt.isEmpty)
      newSegments.foreach(s => rebuilt += ((s.startDt, s.endDt, s.value)))

    // merge adjacent same-value unit intervals
    val merged = ArrayBuffer[(Long, Long, Option[String])](rebuilt.head)
    rebuilt.drop(1).foreach { case (s, e, v) =>
      val (ls, le, lv) = merged.last
      if (lv == v && le == s) merged(merged.length - 1) = (ls, e, lv)
      else merged += ((s, e, v))
    }

    // reuse existing ids positionally; surplus existing rows -> sentinel
    val finalSegs = merged.zipWithIndex.map { case ((s, e, v), idx) =>
      Seg(
        id = if (idx < exist.length) exist(idx).id else None,
        seriesId = seriesId,
        value = v,
        startDt = s,
        endDt = e
      )
    }
    val surplus = exist.drop(finalSegs.length).map(_.copy(seriesId = -1L))
    finalSegs.toSeq ++ surplus
  }

  /** @return (merged segments, redundant ids to delete) */
  def mergeOverlappingSameValue(segments0: Seq[Seg]): (Seq[Seg], Seq[Long]) = {
    if (segments0.isEmpty) return (segments0, Nil)
    val deleteIds = ArrayBuffer.empty[Long]
    deleteIds ++= segments0.filter(s => s.seriesId == -1L && s.id.isDefined).flatMap(_.id)
    val segments = segments0.filter(_.seriesId != -1L)
    if (segments.length <= 1) return (segments, deleteIds.distinct.toSeq)

    val sorted = segments.sortBy(s => (s.value.getOrElse(""), s.startDt, s.endDt, s.id.isEmpty))
    val merged = ArrayBuffer.empty[Seg]
    for (value <- sorted.map(_.value).distinct) {
      val vs = sorted.filter(_.value == value)
      var current = vs.head
      vs.drop(1).foreach { next =>
        if (next.startDt <= current.endDt) {
          val newEnd = math.max(current.endDt, next.endDt)
          (current.id, next.id) match {
            case (None, Some(_))                          => current = current.copy(id = next.id, endDt = newEnd)
            case (Some(a), Some(b)) if a != b             => deleteIds += b; current = current.copy(endDt = newEnd)
            case _                                        => current = current.copy(endDt = newEnd)
          }
        } else {
          merged += current
          current = next
        }
      }
      merged += current
    }
    // null out ids duplicated across merge results (keep first)
    val seen = scala.collection.mutable.Set.empty[Long]
    val deduped = merged.map { s =>
      s.id match {
        case Some(id) if seen.contains(id) => s.copy(id = None)
        case Some(id)                      => seen += id; s
        case None                          => s
      }
    }
    (deduped.toSeq, deleteIds.distinct.toSeq)
  }

  /** Canonical per-segment state keys (idempotence check). */
  def stateKey(segs: Seq[Seg]): Seq[String] =
    segs
      .sortBy(s => (s.startDt, s.endDt))
      .map { s =>
        val id = s.id.map(_.toString).getOrElse("NA")
        val v = s.value.getOrElse("NA")
        s"$id|${s.seriesId}|$v|${s.startDt}|${s.endDt}"
      }

  def segmentsIdentical(current: Seq[Seg], proposed: Seq[Seg]): Boolean =
    stateKey(current) == stateKey(proposed)

  /** Full adjust pass: collapse + merge + idempotence short-circuit.
    * @return None when the proposed state equals the current state
    *         (nothing to write); otherwise Some((segments, deleteIds)).
    */
  def adjust(
      exist: Seq[Seg],
      newSegments: Seq[Seg],
      seriesId: Long,
      bridgeLatestExtension: Boolean = false
  ): Option[(Seq[Seg], Seq[Long])] = {
    val collapsed = collapseSegmentsWithSplit(exist, newSegments, seriesId, bridgeLatestExtension)
    val (merged, deleteIds) = mergeOverlappingSameValue(collapsed)
    if (deleteIds.isEmpty && segmentsIdentical(exist, merged)) None
    else Some((merged, deleteIds))
  }
}
