package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.CommitConflict

/** Branch refs over the ONE shared commit log
  * (sources/SnapshotTable.scala `_refs/` markers): create / write /
  * fast-forward / diverge-refuse, resolution through name-encoded
  * markers sharing the atomic-create claim protocol, retention pins
  * on heads and bases, and the SQL surface (t.refs rows, VERSION AS
  * OF '<branch>', CALL procedures). */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-branch").toString

  locally {
    spark.conf.set("spark.sql.catalog.graftbr",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftbr.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftbr.db")
  }

  private def mk(name: String, rows: Range): String = {
    val root = s"$warehouse/db/$name"
    SnapshotTable.commit(spark, root,
      rows.map(i => (i.toLong, s"r$i")).toDF("k", "tag"))
    root
  }

  test("branch create + write: branch commits advance the branch head " +
      "only — main's view (and every existing reader) is unchanged") {
    val root = mk("b1", 1 to 100)                                // v1
    SnapshotTable.append(spark, root,
      Seq((101L, "r101")).toDF("k", "tag"))                      // v2
    assert(SnapshotTable.createBranch(spark, root, "dev") == 2L)
    // write twice on the branch
    SnapshotTable.append(spark, root,
      Seq((201L, "dev1")).toDF("k", "tag"), branch = "dev")      // v3
    SnapshotTable.append(spark, root,
      Seq((202L, "dev2")).toDF("k", "tag"), branch = "dev")      // v4
    assert(SnapshotTable.branchHead(spark, root, "dev") == 4L)
    assert(SnapshotTable.branchHead(spark, root, "main") == 2L)
    assert(SnapshotTable.currentVersion(spark, root) == 2L,
      "branch commits leaked into main's view")
    assert(SnapshotTable.read(spark, root).count() == 101)
    assert(SnapshotTable.readBranch(spark, root, "dev").count() == 103)
    // branch isolation is two-way: a later main commit is invisible
    // to the branch
    SnapshotTable.append(spark, root,
      Seq((102L, "r102")).toDF("k", "tag"))                      // v5
    assert(SnapshotTable.currentVersion(spark, root) == 5L)
    assert(SnapshotTable.readBranch(spark, root, "dev")
      .filter(col("k") === 102L).count() == 0)
  }

  test("fast-forward: merge is a pointer jump when main has not " +
      "moved, composes across write/merge cycles, and a diverged " +
      "main is refused with the remedy") {
    val root = mk("b2", 1 to 10)                                 // v1
    SnapshotTable.createBranch(spark, root, "etl")
    SnapshotTable.append(spark, root,
      Seq((11L, "e1")).toDF("k", "tag"), branch = "etl")         // v2
    // FF: main 1 == etl base 1 -> jump to 2, no new commit minted
    val before = SnapshotTable.versions(spark, root)
    assert(SnapshotTable.fastForward(spark, root, "etl") == 2L)
    assert(SnapshotTable.versions(spark, root) == before,
      "fast-forward must not mint a commit")
    assert(SnapshotTable.currentVersion(spark, root) == 2L)
    assert(SnapshotTable.read(spark, root).count() == 11)
    // the cycle composes: branch rebases at its head, write + FF again
    SnapshotTable.append(spark, root,
      Seq((12L, "e2")).toDF("k", "tag"), branch = "etl")         // v3
    assert(SnapshotTable.fastForward(spark, root, "etl") == 3L)
    assert(SnapshotTable.read(spark, root).count() == 12)
    // diverge: main moves on its own -> FF refused, nothing changes
    SnapshotTable.append(spark, root, Seq((13L, "m")).toDF("k", "tag"))
    SnapshotTable.append(spark, root,
      Seq((14L, "e3")).toDF("k", "tag"), branch = "etl")
    val e = intercept[CommitConflict](
      SnapshotTable.fastForward(spark, root, "etl"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    assert(e.getMessage.contains("MERGE INTO"), e.getMessage)
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 14L).count() == 0,
      "refused fast-forward must not move main")
    // idempotent no-op: FF when already at the branch head
    val h = SnapshotTable.branchHead(spark, root, "main")
    SnapshotTable.createBranch(spark, root, "noop", Some(h))
    assert(SnapshotTable.fastForward(spark, root, "noop") == h)
  }

  test("PARTIAL fast-forward: a prefix of the branch's commits " +
      "promotes to main as a pointer walk (no new commit), the " +
      "divergent suffix stays on the branch and composes; a middle " +
      "commit, an off-chain version and a diverged main all refuse " +
      "loudly") {
    val root = mk("b_pff", 1 to 10)                              // v1
    SnapshotTable.createBranch(spark, root, "feat")
    SnapshotTable.append(spark, root,
      Seq((11L, "f1")).toDF("k", "tag"), branch = "feat")        // v2
    SnapshotTable.append(spark, root,
      Seq((12L, "f2")).toDF("k", "tag"), branch = "feat")        // v3
    SnapshotTable.append(spark, root,
      Seq((13L, "f3")).toDF("k", "tag"), branch = "feat")        // v4
    // promote the 2-commit prefix (v2, v3); v4 stays branch-only
    val before = SnapshotTable.versions(spark, root)
    assert(SnapshotTable.fastForwardTo(spark, root, "feat", 3L) == 3L)
    assert(SnapshotTable.versions(spark, root) == before,
      "partial fast-forward must not mint a commit")
    assert(SnapshotTable.currentVersion(spark, root) == 3L)
    assert(SnapshotTable.read(spark, root).count() == 12)
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 13L).count() == 0,
      "the unpromoted suffix leaked into main")
    // the suffix is still on the branch, and the cycle composes:
    // promoting the rest is now an ordinary full fast-forward
    assert(SnapshotTable.branchHead(spark, root, "feat") == 4L)
    assert(SnapshotTable.readBranch(spark, root, "feat")
      .filter(col("k") === 13L).count() == 1)
    assert(SnapshotTable.fastForward(spark, root, "feat") == 4L)
    assert(SnapshotTable.read(spark, root).count() == 13)
    // refusals: an off-chain version...
    SnapshotTable.append(spark, root,
      Seq((14L, "f4")).toDF("k", "tag"), branch = "feat")        // v5
    val offChain = intercept[IllegalArgumentException](
      SnapshotTable.fastForwardTo(spark, root, "feat", 999L))
    assert(offChain.getMessage.contains("not on branch"),
      offChain.getMessage)
    // ...a MIDDLE commit after the base is promotable only with its
    // predecessors — skipping is structurally impossible (any upTo on
    // the chain IS a prefix), so the refusal surface is off-chain +
    // diverged; prove diverged:
    SnapshotTable.append(spark, root, Seq((15L, "m")).toDF("k", "tag"))
    val diverged = intercept[CommitConflict](
      SnapshotTable.fastForwardTo(spark, root, "feat", 5L))
    assert(diverged.getMessage.contains("diverged"), diverged.getMessage)
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 14L).count() == 0,
      "refused promotion must not move main")
    // the SQL surface: CALL fast_forward_to promotes through the
    // catalog (fresh table to keep the chain clean)
    val root2 = s"$warehouse/db/b_pff2"
    SnapshotTable.commit(spark, root2,
      (1 to 5).map(i => (i.toLong, s"r$i")).toDF("k", "tag"))    // v1
    SnapshotTable.createBranch(spark, root2, "dev")
    SnapshotTable.append(spark, root2,
      Seq((6L, "d1")).toDF("k", "tag"), branch = "dev")          // v2
    SnapshotTable.append(spark, root2,
      Seq((7L, "d2")).toDF("k", "tag"), branch = "dev")          // v3
    assert(spark.sql("CALL graftbr.system.fast_forward_to(" +
      "'db.b_pff2', 'dev', 2, 'main')").head().getLong(0) == 2L)
    assert(spark.table("graftbr.db.b_pff2").count() == 6)
  }

  test("a claimed branch transition is exclusive: a squatting tx " +
      "marker blocks commits from that head until vacuum reaps it, " +
      "exactly like a crashed version claim") {
    val root = mk("b3", 1 to 5)                                  // v1
    SnapshotTable.createBranch(spark, root, "wedge")
    val head = SnapshotTable.branchHead(spark, root, "wedge")
    val tx = java.nio.file.Paths.get(
      s"$root/_refs/wedge/tx-$head")
    java.nio.file.Files.createFile(tx)
    intercept[CommitConflict](SnapshotTable.append(spark, root,
      Seq((9L, "x")).toDF("k", "tag"), branch = "wedge"))
    // vacuum (age floor 0) reaps the orphan transition; commit flows
    SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(tx),
      "vacuum must reap a wedged transition with no nx pointer")
    SnapshotTable.append(spark, root,
      Seq((9L, "x")).toDF("k", "tag"), branch = "wedge")
    assert(SnapshotTable.readBranch(spark, root, "wedge").count() == 6)
    // ...and a TAKEN transition (tx with its nx) is never reaped
    SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(SnapshotTable.readBranch(spark, root, "wedge").count() == 6)
  }

  test("retention pins branch heads and bases; interior chain " +
      "versions may expire without breaking head resolution") {
    val root = mk("b4", 1 to 20)                                 // v1
    SnapshotTable.createBranch(spark, root, "keep")              // base 1
    (1 to 3).foreach(i => SnapshotTable.append(spark, root,
      Seq((100L + i, s"d$i")).toDF("k", "tag"), branch = "keep"))
    // main advances past everything
    (1 to 3).foreach(i => SnapshotTable.append(spark, root,
      Seq((200L + i, s"m$i")).toDF("k", "tag")))
    val head = SnapshotTable.branchHead(spark, root, "keep")     // v4
    assert(head == 4L)
    val mainHead = SnapshotTable.branchHead(spark, root, "main") // v7
    assert(mainHead == 7L)
    val gone = SnapshotTable.expireSnapshots(spark, root, 1)
    // doomed candidates are every version but the newest; pins keep
    // the branch head+base and the main head (v2, v3 = interior keep
    // chain; v5, v6 = interior main chain)
    assert(!gone.contains(1L) && !gone.contains(4L) &&
      !gone.contains(7L), s"pinned versions expired: $gone")
    assert(gone.toSet == Set(2L, 3L, 5L, 6L), gone.toString)
    // resolution still walks to the right heads; data intact
    assert(SnapshotTable.branchHead(spark, root, "keep") == 4L)
    assert(SnapshotTable.readBranch(spark, root, "keep").count() == 23)
    assert(SnapshotTable.read(spark, root).count() == 23)
    // dropping the branch releases its pins
    assert(SnapshotTable.dropBranch(spark, root, "keep"))
    val gone2 = SnapshotTable.expireSnapshots(spark, root, 1)
    assert(gone2.contains(4L), s"dropped branch head still pinned: $gone2")
  }

  test("SQL surface: CALL create_branch / fast_forward / drop_branch, " +
      "t.refs lists branches with type and base, VERSION AS OF " +
      "'<branch>' reads the head, INSERT INTO writes main") {
    spark.sql("CREATE TABLE graftbr.db.sqlb (k BIGINT, tag STRING)")
    spark.sql("INSERT INTO graftbr.db.sqlb VALUES (1, 'a'), (2, 'b')")
    val root = s"$warehouse/db/sqlb"
    val created = spark.sql(
      "CALL graftbr.system.create_branch('db.sqlb', 'exp', 0)").head()
    assert(created.getString(0) == "exp" && created.getLong(1) == 2L)
    // a branch write through the API; main write through SQL
    SnapshotTable.append(spark, root,
      Seq((10L, "exp1")).toDF("k", "tag"), branch = "exp")
    spark.sql("INSERT INTO graftbr.db.sqlb VALUES (3, 'c')")
    assert(spark.table("graftbr.db.sqlb").count() == 3)
    assert(spark.sql(
      "SELECT count(*) FROM graftbr.db.sqlb VERSION AS OF 'exp'")
      .head().getLong(0) == 3L)
    assert(spark.sql(
      "SELECT tag FROM graftbr.db.sqlb VERSION AS OF 'exp' " +
        "WHERE k = 10").head().getString(0) == "exp1")
    // refs table: main + exp as branches, with bases
    val refs = spark.sql(
      "SELECT name, version, type, base FROM graftbr.db.sqlb.refs " +
        "WHERE type = 'branch' ORDER BY name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(refs.map(_._1) == Seq("exp", "main"), refs.toString)
    assert(refs.find(_._1 == "exp").get._3 == 2L, refs.toString)
    // diverged: FF refused through SQL too
    val e = intercept[Exception](spark.sql(
      "CALL graftbr.system.fast_forward('db.sqlb', 'exp', 'main')"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // drop through SQL
    assert(spark.sql(
      "CALL graftbr.system.drop_branch('db.sqlb', 'exp')")
      .head().getBoolean(0))
    assert(SnapshotTable.branches(spark, root) == Seq("main"))
    // a dropped branch no longer resolves in VERSION AS OF
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graftbr.db.sqlb VERSION AS OF 'exp'").collect())
    assert(e2.getMessage.contains("neither"), e2.getMessage)
  }

  test("branch name hygiene: digits-only, 'main', tag collisions and " +
      "unknown branches are refused; un-branched tables never grow " +
      "a _refs dir") {
    val root = mk("b5", 1 to 3)
    assert(!new java.io.File(s"$root/_refs").exists(),
      "plain tables must not pay for branching")
    SnapshotTable.tag(spark, root, "pinned", 1L)
    intercept[IllegalArgumentException](
      SnapshotTable.createBranch(spark, root, "123"))
    intercept[IllegalArgumentException](
      SnapshotTable.createBranch(spark, root, "main"))
    intercept[IllegalArgumentException](
      SnapshotTable.createBranch(spark, root, "pinned"))
    intercept[IllegalArgumentException](
      SnapshotTable.branchHead(spark, root, "nope"))
    intercept[IllegalArgumentException](
      SnapshotTable.append(spark, root, Seq((9L, "x")).toDF("k", "tag"),
        branch = "nope"))
  }

  test("the VERSION AS OF namespace refuses collisions BOTH ways: " +
      "tagging a live branch name is refused (tags resolve first and " +
      "would silently freeze the branch's readers), and a forked nx " +
      "chain fails head resolution loudly instead of picking a side") {
    val root = mk("b7", 1 to 3)
    SnapshotTable.createBranch(spark, root, "dev")
    // tag() must refuse the branch name — the mirror of createBranch
    // refusing tag names
    val e = intercept[IllegalArgumentException](
      SnapshotTable.tag(spark, root, "dev", 1L))
    assert(e.getMessage.contains("branch"), e.getMessage)
    // a non-colliding tag still works
    SnapshotTable.tag(spark, root, "ok", 1L)

    // a createBranch that crashed between the sentinel and the base
    // marker: re-running COMPLETES the creation instead of wedging
    // behind "already exists"
    val crashDir = new java.io.File(s"$root/_refs/crashed")
    crashDir.mkdirs()
    new java.io.File(crashDir, "created").createNewFile()
    intercept[IllegalArgumentException](
      SnapshotTable.branchHead(spark, root, "crashed"))
    val cBase = SnapshotTable.createBranch(spark, root, "crashed")
    assert(SnapshotTable.branchHead(spark, root, "crashed") == cBase)

    // forge the fork a vacuumed-then-published stalled committer
    // would leave: two nx markers from the same head — resolution
    // must fail with the heal instruction, not silently pick one
    val dir = new java.io.File(s"$root/_refs/dev")
    val base = SnapshotTable.branchBase(spark, root, "dev")
    new java.io.File(dir, s"nx-$base-90").createNewFile()
    new java.io.File(dir, s"nx-$base-91").createNewFile()
    val f = intercept[IllegalArgumentException](
      SnapshotTable.branchHead(spark, root, "dev"))
    assert(f.getMessage.contains("fork"), f.getMessage)
  }

  test("merge-on-read semantics survive on a branch: a branch MOR " +
      "update after fast-forward round-trips (the oracled query's " +
      "shape, pinned here end-to-end)") {
    val root = s"$warehouse/db/b6"
    SnapshotTable.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("k", "v"))
    SnapshotTable.createBranch(spark, root, "fix")
    // branch carries a MOR update; main is untouched until the merge
    SnapshotTable.setProperties(spark, root,
      Map("write.mode" -> "merge-on-read", "write.merge.key" -> "k"))
    SnapshotTable.append(spark, root,
      Seq((51L, 51.0)).toDF("k", "v"), branch = "fix")
    assert(SnapshotTable.read(spark, root).count() == 50)
    SnapshotTable.fastForward(spark, root, "fix")
    assert(SnapshotTable.read(spark, root).count() == 51)
    assert(SnapshotTable.read(spark, root)
      .agg(sum("v")).head().getDouble(0) == (1 to 51).map(_.toDouble).sum)
  }
}
