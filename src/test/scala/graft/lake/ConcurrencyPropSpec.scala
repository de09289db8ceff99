package graft.lake

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Multi-writer serializability, model-based: two writer threads race
  * random append / MOR-delete / compact scripts against ONE table
  * root (each through its own GraftTable instance, i.e. no shared
  * in-process state — only the commit protocol coordinates them),
  * every operation wrapped in `GraftTable.retryOnConflict`.
  *
  * The op vocabulary is chosen so every serial order converges to the
  * same final state — appends insert thread-unique keys, deletes
  * target the deleting thread's own earlier keys, compaction is
  * data-neutral — which turns "equivalent to SOME serial order" into
  * an exact check: the final visible key set must equal
  * (all appended) − (all deleted), and the committed snapshots must
  * form one linear parent chain (every commit observed its
  * predecessor: nothing forked, nothing lost).
  */
class ConcurrencyPropSpec extends SparkSuite {

  private val schema = StructType.fromDDL("k STRING, v BIGINT")

  /** In-process object-store stand-in for the commit boundary
    * (exercising the seam the reference delegates to its REST catalog,
    * docker-compose.yml:26-37): `publishNew` is a CONDITIONAL PUT —
    * the atomic compare-and-set a store serves via S3
    * `If-None-Match: *` / GCS generation-match, stood in for by the
    * hard-link primitive — wrapped in request latency on both sides,
    * and the mutable-pointer overwrite is a separate, slower request.
    * That makes the window where a new version EXISTS but the hint
    * still points at the old one wide (milliseconds, like a real
    * store), instead of POSIX-nanoseconds — exactly the window the
    * commit protocol's re-read/retry logic must survive. Counters
    * expose how often the conditional put actually conflicted. */
  private final class FakeObjectStore(latencyMs: Long)
      extends CommitProvider {
    val puts = new java.util.concurrent.atomic.AtomicLong
    val conflicts = new java.util.concurrent.atomic.AtomicLong
    private def lag(): Unit = {
      val ms = java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(latencyMs + 1)
      if (ms > 0) Thread.sleep(ms)
    }
    override def publishNew(target: java.nio.file.Path,
        content: String): Boolean = {
      lag()
      val won = Io.atomicPublishNew(target, content)
      puts.incrementAndGet()
      if (!won) conflicts.incrementAndGet()
      lag()
      won
    }
    override def overwrite(target: java.nio.file.Path,
        content: String): Unit = {
      lag()
      Io.atomicWrite(target, content)
      lag()
    }
  }

  private sealed trait WOp
  private case class WAppend(rows: Int) extends WOp
  private case class WDeleteOwn(pick: Int) extends WOp
  private case class WEqDeleteOwn(pick: Int) extends WOp
  private case class WUpdateOwn(pick: Int) extends WOp
  private case object WExpire extends WOp
  private case object WCompact extends WOp

  private val genOp: Gen[WOp] = Gen.frequency(
    5 -> Gen.choose(1, 3).map(WAppend),
    2 -> Gen.choose(0, 7).map(WDeleteOwn),
    1 -> Gen.choose(0, 7).map(WEqDeleteOwn),
    1 -> Gen.const(WCompact))

  // the N-writer mix adds COW updates (value-only: the key-set check
  // stays exact) and snapshot expiry (data-neutral; retainLast keeps
  // a deep buffer so a concurrent writer's captured base never loses
  // its files mid-operation — see WExpire below)
  private val genOpN: Gen[WOp] = Gen.frequency(
    5 -> Gen.choose(1, 3).map(WAppend),
    2 -> Gen.choose(0, 7).map(WDeleteOwn),
    1 -> Gen.choose(0, 7).map(WEqDeleteOwn),
    2 -> Gen.choose(0, 7).map(WUpdateOwn),
    1 -> Gen.const(WExpire),
    1 -> Gen.const(WCompact))

  private val genScript: Gen[List[WOp]] =
    Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, genOp))

  private val genScriptsN: Gen[List[List[WOp]]] =
    Gen.choose(4, 8).flatMap(w => Gen.listOfN(w,
      Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, genOpN))))

  private def runRace(s1: List[WOp], s2: List[WOp],
      provider: CommitProvider = LocalCommitProvider,
      sweepAfter: Boolean = false): Boolean =
    runRaceN(List(s1, s2), provider, sweepAfter)

  private def runRaceN(scripts: List[List[WOp]],
      provider: CommitProvider = LocalCommitProvider,
      sweepAfter: Boolean = false): Boolean = {
    val root = graft.ScratchDirs.create("graft-race-")
      .resolve("default").resolve("race")
    GraftTable.create(spark, root, "default.race", schema,
      Map("write.delete.mode" -> "merge-on-read"), commit = provider)
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val deleted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new CyclicBarrier(scripts.size)
    // a racer whose captured base loses files to a CONCURRENT expiry
    // retries the whole op from a fresh capture — the reader-retry
    // discipline snapshot expiry demands of long-running readers
    // (Iceberg shares the hazard); every op's reads happen BEFORE its
    // commit, so a retry never doubles an effect
    def isFileGone(e: Throwable): Boolean = {
      var c: Throwable = e
      while (c != null) {
        if (c.isInstanceOf[java.io.FileNotFoundException] ||
            c.isInstanceOf[java.nio.file.NoSuchFileException] ||
            Option(c.getMessage).exists(m =>
              m.contains("FileNotFound") || m.contains("does not exist")))
          return true
        c = c.getCause
      }
      false
    }
    def withExpiredRetry[A](attempts: Int)(body: => A): A = {
      var left = attempts
      while (true) {
        try return body
        catch { case e: Throwable if left > 1 && isFileGone(e) =>
          left -= 1 }
      }
      throw new IllegalStateException("unreachable")
    }
    def writer(tid: Int, script: List[WOp]): Thread = new Thread(() => {
      try {
        val t = GraftTable.load(spark, root, commit = provider)
        val own = scala.collection.mutable.ArrayBuffer.empty[String]
        barrier.await()
        script.zipWithIndex.foreach { case (op, j) =>
          withExpiredRetry(3) {
          GraftTable.retryOnConflict(maxAttempts = 10,
              firstBackoffMs = 20) {
            op match {
              case WAppend(n) =>
                val keys = (0 until n).map(r => s"t$tid-b$j-r$r")
                t.append(spark.createDataFrame(
                  keys.map(k => Row(k, j.toLong)).asJava, schema))
                keys.foreach { k => own += k; appended.add(k) }
              case WDeleteOwn(pick) if own.nonEmpty =>
                val k = own(pick % own.size)
                if (t.delete(col("k") === k).nonEmpty) deleted.add(k)
              case WDeleteOwn(_) => () // nothing of ours to delete yet
              case WEqDeleteOwn(pick) if own.nonEmpty =>
                // equality delete on an own key: keys are never
                // re-inserted, so the serial-order effect is the same
                // as a positional delete
                val k = own(pick % own.size)
                import spark.implicits._
                if (t.equalityDelete(Seq(k).toDF("k")).nonEmpty)
                  deleted.add(k)
              case WEqDeleteOwn(_) => ()
              case WUpdateOwn(pick) if own.nonEmpty =>
                // COW update (update.mode unset => copy-on-write) of
                // an OWN key's value: key set untouched, so every
                // serial order still converges; exercises the rewrite
                // path racing appends/deletes/compaction
                val k = own(pick % own.size)
                t.update(col("k") === k, Map("v" -> lit(999L)))
              case WUpdateOwn(_) => ()
              case WExpire =>
                // retainLast=25 keeps a deep suffix (a captured base
                // is usually a few commits stale — capture happens per
                // attempt), and withExpiredRetry covers the tail where
                // 25+ commits land inside one op's window: the racer
                // re-captures instead of failing — the production
                // reader-retry discipline, not a hidden race
                t.expireSnapshots(
                  olderThanMs = System.currentTimeMillis() + 1000,
                  retainLast = 25)
              case WCompact =>
                t.rewriteDataFiles()
            }
          }
          }
        }
      } catch { case e: Throwable => errors.add(e) }
    })
    val threads = scripts.zipWithIndex.map { case (s0, i) =>
      writer(i + 1, s0)
    }
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    assert(errors.isEmpty,
      s"writer failed despite retry: ${errors.asScala.headOption}")
    val t = GraftTable.load(spark, root)
    // final state = the unique serial-order result
    val want = appended.asScala.toSet -- deleted.asScala.toSet
    val got = t.read().select("k").collect().map(_.getString(0)).toSet
    assert(got == want,
      s"missing: ${(want -- got).take(5)} spurious: ${(got -- want).take(5)}")
    // commits form ONE linear chain: every snapshot's parent is the
    // snapshot committed immediately before it (after an expiry the
    // list is a SUFFIX of the chain, so the first retained snapshot
    // may point at an expired predecessor — every later link stays
    // strict)
    val snaps = t.meta.snapshots
    val everExpired = scripts.exists(_.contains(WExpire))
    snaps.zipWithIndex.foreach { case (s, i) =>
      val expectedParent = if (i == 0) None else Some(snaps(i - 1).snapshotId)
      if (i > 0 || !everExpired)
        assert(s.parentId == expectedParent,
          s"forked history at ${s.snapshotId}: parent ${s.parentId}, " +
            s"expected $expectedParent")
    }
    if (sweepAfter) {
      // losers' unpublished manifests/segments/data are debris the
      // orphan sweep must clear WITHOUT touching anything reachable
      val t2 = GraftTable.load(spark, root, commit = provider)
      t2.removeOrphanFiles(
        olderThanMs = System.currentTimeMillis() + 1000, force = true)
      val after = t2.read().select("k").collect()
        .map(_.getString(0)).toSet
      assert(after == want,
        s"orphan sweep changed visible data: missing " +
          s"${(want -- after).take(5)} spurious ${(after -- want).take(5)}")
    }
    true
  }

  test("∀ two-writer races of append/delete/compact under retry: final " +
    "state equals the serial-order result and history stays linear") {
    val prop = Prop.forAll(genScript, genScript)(
      (s1, s2) => runRace(s1, s2))
    // 100 races ≈ 45 s on local[4]; override with -Dgraft.race.runs
    val runs = sys.props.get("graft.race.runs").map(_.toInt).getOrElse(100)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(runs)
      .withInitialSeed(Seed(4242L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("∀ N-writer (4-8) races of append/MOR-delete/COW-update/" +
    "compact/expire under retry: final state equals the serial-order " +
    "result, history stays linear, expiry never strands a racer") {
    val prop = Prop.forAll(genScriptsN)(ss => runRaceN(ss))
    val runs = sys.props.get("graft.race.n.runs").map(_.toInt).getOrElse(20)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(runs)
      .withInitialSeed(Seed(2828L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("∀ two-writer races over the OBJECT-STORE commit provider " +
    "(conditional put + request latency, wide publish→pointer window): " +
    "same serializability invariants hold, and the orphan sweep clears " +
    "loser debris without touching live data") {
    val prop = Prop.forAll(genScript, genScript) { (s1, s2) =>
      runRace(s1, s2, provider = new FakeObjectStore(latencyMs = 2),
        sweepAfter = true)
    }
    val runs = sys.props.get("graft.race.store.runs")
      .map(_.toInt).getOrElse(25)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(runs)
      .withInitialSeed(Seed(1717L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
    // the conditional-put CONFLICT path is proven deterministically
    // (whether the randomized races' publishes collide is a
    // thread-timing accident — asserting on it made the suite flaky):
    // the second put of the same object must lose and be counted
    val store = new FakeObjectStore(latencyMs = 0)
    val tgt = graft.ScratchDirs.create("graft-race-")
      .resolve("v0001.json")
    assert(store.publishNew(tgt, "winner"),
      "first conditional put must win")
    assert(!store.publishNew(tgt, "loser"),
      "second conditional put of the same object must lose")
    assert(store.conflicts.get() === 1 && store.puts.get() === 2)
    // ...and the COMMIT PATH must still be able to produce contention
    // at all — a regression that accidentally serializes commits would
    // pass every randomized race vacuously. Barrier-started writers
    // under WIDE latency windows make overlap near-certain; a bounded
    // retry absorbs the thread-timing tail without reintroducing the
    // single-shot flake.
    val contended = (1 to 8).exists { _ =>
      val st = new FakeObjectStore(latencyMs = 25)
      assert(runRace(List(WAppend(2), WAppend(1), WAppend(2)),
        List(WAppend(1), WAppend(2), WAppend(1)), provider = st))
      st.conflicts.get() > 0
    }
    assert(contended,
      "no conditional-put conflict in 8 barrier-started two-writer " +
        "races under 25ms latency windows — has the commit path " +
        "accidentally serialized?")
  }
}
