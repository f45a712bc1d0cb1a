package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch-lifetime policy ([[EntryKit.scratchPath]] /
  * [[EntryKit.sweepStale]]): fixture-sized scratch must not accumulate
  * across runs — the index entries clean inline, everything else is
  * swept by the own-dirs shutdown hook plus a stale-sibling reap on
  * first use. The age threshold is the safety property under test: a
  * FRESH sibling (a concurrent run's live scratch) must survive the
  * sweep, a >2 h-old one must not.
  */
class EntryKitSpec extends AnyFunSuite {

  test("sweepStale deletes old graft-prefixed siblings, keeps fresh " +
      "ones, non-graft dirs, and the caller's own dir") {
    val parent = graft.EntryKit.scratchTracked("graft_kit_parent")
    def mk(name: String, ageMs: Long): java.nio.file.Path = {
      val d = java.nio.file.Files.createDirectory(parent.resolve(name))
      java.nio.file.Files.createFile(d.resolve("payload"))
      java.nio.file.Files.setLastModifiedTime(d,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageMs))
      d
    }
    val hour = 60L * 60 * 1000
    val stale = mk("graft_old", 3 * hour)
    val fresh = mk("graft_fresh", 1 * hour) // a concurrent run's scratch
    val alien = mk("other_old", 3 * hour)   // not ours to touch
    val own = mk("graft_own", 3 * hour)     // the caller's new dir
    EntryKit.sweepStale(parent, Some(own))
    assert(!java.nio.file.Files.exists(stale))
    assert(java.nio.file.Files.exists(fresh))
    assert(java.nio.file.Files.exists(alien))
    assert(java.nio.file.Files.exists(own))
    EntryKit.deleteRecursively(parent)
  }

  test("scratchPath-created dirs are tracked and deletable; " +
      "deleteRecursively tolerates a dir already cleaned inline") {
    val p = EntryKit.scratchPath("graft_kitspec")
    assert(java.nio.file.Files.isDirectory(p))
    java.nio.file.Files.createFile(p.resolve("x"))
    EntryKit.deleteRecursively(p) // the servedThenCleanup path
    assert(!java.nio.file.Files.exists(p))
    EntryKit.deleteRecursively(p) // shutdown hook hitting it again: no-op
  }
}
