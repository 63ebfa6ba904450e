package graft.core

import java.nio.file.Files
import java.time.Instant
import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import TableVersions._

/** Randomized cross-implementation equivalence: the SAME seeded operation
  * sequence (mixed add/remove commits, rollbacks to random earlier commits,
  * roll-forward commits after rollback) is driven through the in-memory and
  * durable-JSON logs in lockstep, asserting after EVERY step that the two
  * folds agree — current version, commit metadata, and `versionAt` time
  * travel for every commit in the history. The JSON side is additionally
  * restarted (new instance, same dir) and checkpointed mid-sequence, both
  * of which must be invisible to the fold. Seeded, so a failure replays
  * exactly; this is the property-level safety net under the example-based
  * contract suite. */
class LogEquivalenceSpec extends AnyFunSuite with Matchers {

  private val who = UserId("equiv-test")

  private def assertEquivalent(
      mem: TableVersions, json: TableVersions, tbl: TableName): Unit = {
    json.currentVersion(tbl) shouldBe mem.currentVersion(tbl)
    val mu = mem.updates(tbl) // newest first; the OLDEST entry is init
    val ju = json.updates(tbl)
    // every shared TableUpdate commit carries one id in both logs; only the
    // init commit's id is minted per-log — align it by position
    ju.dropRight(1) shouldBe mu.dropRight(1)
    ju.last.copy(id = mu.last.id) shouldBe mu.last
    mu.dropRight(1).foreach(u => json.versionAt(tbl, u.id) shouldBe mem.versionAt(tbl, u.id))
    json.versionAt(tbl, ju.last.id) shouldBe mem.versionAt(tbl, mu.last.id)
  }

  test("seeded random op sequences fold identically in both impls; restart is invisible") {
    for (round <- 0 until 3) {
      val rnd = new scala.util.Random(20260813L + round)
      val dir = Files.createTempDirectory(s"graft_equiv_$round").toString
      var json: TableVersions = JsonFileTableVersions(dir)
      val mem = new InMemoryTableVersions
      val tbl = TableName("db", s"t$round")
      val initInstant = Instant.ofEpochSecond(0)
      json.init(tbl, isSnapshot = false, who, UpdateMessage("init"), initInstant)
      mem.init(tbl, isSnapshot = false, who, UpdateMessage("init"), initInstant)
      val parts = (1 to 6).map(i => Partition(PartitionColumn("date"), f"2026-01-$i%02d"))

      for (step <- 1 to 40) {
        rnd.nextInt(10) match {
          case r if r < 7 => // a commit mixing adds and removes
            val ops = (0 to rnd.nextInt(2)).map { _ =>
              val p = parts(rnd.nextInt(parts.size))
              if (rnd.nextInt(4) == 0) TableOperation.RemovePartition(p)
              else TableOperation.AddPartitionVersion(
                p, Version(Instant.ofEpochSecond(step.toLong), new UUID(rnd.nextLong(), rnd.nextLong())))
            }.toList
            // one TableUpdate VALUE for both logs — shared commit id
            val u = TableUpdate(who, UpdateMessage(s"step $step"), Instant.ofEpochSecond(step.toLong), ops)
            json.commit(tbl, u); mem.commit(tbl, u)
          case 7 | 8 => // rollback to a random commit (same chronological position in each log)
            val idx = rnd.nextInt(mem.updates(tbl).size)
            mem.setCurrentVersion(tbl, mem.updates(tbl)(idx).id)
            json.setCurrentVersion(tbl, json.updates(tbl)(idx).id)
          case _ => // JSON restart: re-open from disk, must change nothing
            json = JsonFileTableVersions(dir)
        }
        assertEquivalent(mem, json, tbl)
      }
      mem.updates(tbl).size should be > 10 // the sequence really committed
    }
  }

  test("checkpoint mid-sequence is invisible to the fold of the retained tail") {
    val rnd = new scala.util.Random(9L)
    val dir = Files.createTempDirectory("graft_equiv_ckpt").toString
    val log = JsonFileTableVersions(dir)
    val tbl = TableName("db", "ct")
    log.init(tbl, isSnapshot = false, who, UpdateMessage("init"), Instant.ofEpochSecond(0))
    val p = Partition(PartitionColumn("date"), "2026-02-01")
    for (step <- 1 to 12)
      log.commit(tbl, TableUpdate(who, UpdateMessage(s"s$step"), Instant.ofEpochSecond(step.toLong),
        List(TableOperation.AddPartitionVersion(
          p, Version(Instant.ofEpochSecond(step.toLong), new UUID(rnd.nextLong(), rnd.nextLong()))))))
    val before = log.currentVersion(tbl)
    val retained = log.updates(tbl).take(3)
    val beforeAt = retained.map(u => u.id -> log.versionAt(tbl, u.id)).toMap

    log.checkpoint(tbl, keepLast = 3) shouldBe true

    val reopened = JsonFileTableVersions(dir)
    reopened.currentVersion(tbl) shouldBe before
    retained.foreach(u => reopened.versionAt(tbl, u.id) shouldBe beforeAt(u.id))
  }
}
