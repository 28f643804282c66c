package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

/** HYDAT version-watch semantics (`R/hydat_check.R:1-72`). Pure
  * driver-side logic — no Spark session needed. */
class HydatCheckSpec extends AnyFunSuite {
  import HydatCheck._

  test("no local copy: fresh install, reported updated") {
    var downloads = 0
    val r = check(None, "20240115", () => { downloads += 1; Some("2024-01-15") })
    assert(r.outcome == Installed && r.updated)
    assert(r.localVersion.contains("20240115")) // stamp normalized
    assert(downloads == 1)
  }

  test("failed fresh install (re-read finds nothing or a stale stamp) is UpdateFailed, not Installed") {
    val r = check(None, "20240115", () => None)
    assert(r.outcome == UpdateFailed && !r.updated)
    val r2 = check(None, "20240115", () => Some("20231001"))
    assert(r2.outcome == UpdateFailed && !r2.updated)
  }

  test("stamps equal (across formats): no download") {
    var downloads = 0
    val r = check(Some("2024-01-15"), "20240115", () => { downloads += 1; None })
    assert(r.outcome == UpToDate && !r.updated)
    assert(downloads == 0)
  }

  test("stale local: download then re-check confirms the update") {
    val r = check(Some("20231001"), "2024-01-15", () => Some("20240115"))
    assert(r.outcome == Updated && r.updated)
    assert(r.localVersion.contains("20240115"))
  }

  test("silent download failure: re-check still stale -> not updated") {
    // the reference warns about an open connection blocking the
    // overwrite; download 'succeeds' but the stamp didn't move
    val r = check(Some("20231001"), "20240115", () => Some("20231001"))
    assert(r.outcome == UpdateFailed && !r.updated)
    val r2 = check(Some("20231001"), "20240115", () => None)
    assert(r2.outcome == UpdateFailed && !r2.updated)
  }
}
