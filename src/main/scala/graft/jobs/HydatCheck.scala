package graft.jobs

/** HYDAT version watch — `R/hydat_check.R:1-72` in YukonWRB/AquaCache:
  * compare the local HYDAT database's version stamp against the
  * published remote stamp and download when stale, driving the
  * scheduled refresh that keeps `update_hydat` (here the
  * `q_hydat_merge` path over [[graft.sources.JdbcSourceAdapter]])
  * reading current data.
  *
  * The reference's semantics, all mirrored:
  *   - version stamps are dates normalized to `yyyymmdd` (the
  *     reference strips dashes from `hy_version()$Date`, `:29-30`);
  *   - no local copy -> fresh install, reported updated (`:54-64`);
  *   - stale local -> download, then RE-CHECK: a download can fail
  *     without raising (an open connection blocks the overwrite,
  *     `:33-49`), so updated=true only when the re-read stamp equals
  *     the remote;
  *   - equal stamps -> no action.
  *
  * Pure driver-side control flow (two scalar version stamps — there is
  * nothing to distribute); the download itself sits behind a function
  * seam like the Transport seam, so tests and the zero-egress fixture
  * environment inject it.
  */
object HydatCheck {

  sealed trait Outcome
  /** No local HYDAT existed; a fresh copy was installed. */
  case object Installed extends Outcome
  /** Local was stale; the download brought it to the remote version. */
  case object Updated extends Outcome
  /** Local already matches the remote stamp; nothing done. */
  case object UpToDate extends Outcome
  /** Download ran but the re-read stamp still differs (e.g. an open
    * connection blocked the overwrite). */
  case object UpdateFailed extends Outcome

  final case class Result(outcome: Outcome, updated: Boolean, localVersion: Option[String])

  /** `2024-01-15` / `20240115` -> `20240115` — the reference's
    * `gsub("-", "", as.character(as.Date(...)))`. */
  def normalizeStamp(v: String): String = v.replace("-", "").trim

  /** @param localVersion current local stamp, None when no HYDAT exists
    * @param remoteVersion the published remote stamp
    * @param download performs the download and returns the re-read
    *                 local stamp afterwards (None when the re-read
    *                 finds nothing — a failed install)
    */
  def check(
      localVersion: Option[String],
      remoteVersion: String,
      download: () => Option[String]
  ): Result = {
    val remote = normalizeStamp(remoteVersion)
    localVersion.map(normalizeStamp) match {
      case None =>
        // a fresh install gets the same post-download re-check the
        // stale path performs: a None re-read (or a stamp that still
        // isn't the remote's) is a FAILED install, not a success
        val fresh = download().map(normalizeStamp)
        if (fresh.contains(remote)) Result(Installed, updated = true, fresh)
        else Result(UpdateFailed, updated = false, fresh)
      case Some(local) if local == remote =>
        Result(UpToDate, updated = false, Some(local))
      case Some(_) =>
        val fresh = download().map(normalizeStamp)
        if (fresh.contains(remote)) Result(Updated, updated = true, fresh)
        else Result(UpdateFailed, updated = false, fresh)
    }
  }
}
