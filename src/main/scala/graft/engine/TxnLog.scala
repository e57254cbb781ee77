package graft.engine

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mini transaction log: optimistic-concurrency multi-writer commits
  * and time-travel reads over plain-parquet versioned snapshots —
  * the Delta-lake idea reduced to its two load-bearing mechanisms,
  * built on nothing but the filesystem's atomic create:
  *
  *  1. **Version claim**: commit N+1 is claimed by atomically
  *     creating `_txn_log/vN+1.claim` (`File.createNewFile` —
  *     exactly one concurrent writer can win). A writer that loses
  *     the claim did its work against a stale snapshot.
  *  2. **Read-set validation (OCC)**: every commit records the key
  *     set it WROTE in its meta record. A losing writer compares its
  *     READ set against the written keys of every intervening
  *     commit: disjoint → its delta is still serializable, re-claim
  *     with the same delta (rebase without recompute); overlapping →
  *     the classic lost-update hazard, the transaction is REJECTED
  *     and must re-run against the new snapshot.
  *
  * Each version directory holds the commit's DELTA (keyed upserts /
  * deletes) and the materialized post-commit SNAPSHOT; a version is
  * visible to readers only once its `vN.commit` marker exists, so a
  * crashed writer's half-written claim is invisible to READERS
  * (`latestCommitted` skips unmarked claims). For WRITERS the dead
  * slot is recovered in-code: a claim's owner heartbeats the claim
  * file's mtime while it works, and a waiting writer that sees a
  * claim go a full `claimTimeoutMs` without a heartbeat treats it as
  * abandoned and deletes it (age-checked claim steal) — no external
  * janitor is required for liveness after a writer crash.
  *
  * Scale notes (100 TB): the per-version materialized snapshot is
  * the fixture-scale stand-in for file-level copy-on-write — a real
  * table format rewrites only the files a delta touches and stores
  * per-file min/max+bloom stats; the written-keys meta here plays
  * that stats role for conflict checks, and the claim/marker pair is
  * byte-for-byte the atomic-rename commit protocol those formats use
  * on object stores. Deltas stay keyed and bounded by the
  * transaction (shuffle sized by the change, not the table).
  */
object TxnLog {

  /** Per-commit metadata: the version, the snapshot version the
    * writer read, and the keys the commit wrote (upserts + deletes). */
  final case class CommitMeta(version: Long, readVersion: Long,
      writtenKeys: Set[Long])

  /** Transaction outcome statistics for one `commit` call. */
  final case class TxnStats(version: Long, attempts: Int, conflicts: Int)

  final class Conflict(msg: String) extends RuntimeException(msg)

  /** A commit whose post-state violated the table's CHECK constraint
    * — rejected before anything became visible (the claim is
    * released, the log is untouched). */
  final class CheckViolation(msg: String) extends RuntimeException(msg)

  private def logDir(root: String): File = new File(root, "_txn_log")

  private def metaFile(root: String, v: Long): File =
    new File(logDir(root), s"v$v.meta")
  private def claimFile(root: String, v: Long): File =
    new File(logDir(root), s"v$v.claim")
  private def commitMarker(root: String, v: Long): File =
    new File(logDir(root), s"v$v.commit")

  def init(root: String): Unit = { logDir(root).mkdirs(); () }

  private def txnIdFile(root: String, v: Long): File =
    new File(logDir(root), s"v$v.txn")

  /** The version a given application-level transaction id already
    * committed as, if any — the Delta `txn` (appId, version) dedup
    * that makes a re-driven streaming micro-batch a no-op instead of
    * a double-apply. */
  def committedTxn(root: String, txnId: String): Option[Long] =
    Option(logDir(root).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".txn"))
      .find(f => new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8) == txnId)
      .map(_.getName.stripPrefix("v").stripSuffix(".txn").toLong)

  /** Largest version whose commit marker exists; -1 for an empty
    * table. Claims without markers (in-flight or crashed writers)
    * are invisible. */
  def latestCommitted(root: String): Long = {
    val files = Option(logDir(root).listFiles()).getOrElse(Array.empty)
    val committed = files.filter(_.getName.endsWith(".commit"))
      .map(_.getName.stripPrefix("v").stripSuffix(".commit").toLong)
    if (committed.isEmpty) -1L else committed.max
  }

  /** Time travel: the materialized snapshot as of `version`.
    * Columns: key LONG, value LONG. */
  def read(spark: SparkSession, root: String, version: Long): DataFrame = {
    require(version >= 0 && commitMarker(root, version).exists(),
      s"version $version does not exist or is uncommitted")
    require(new File(root, s"snapshot_v$version").isDirectory,
      s"version $version was vacuumed — its snapshot data is gone " +
        "(markers/metas remain for audit)")
    spark.read.parquet(s"$root/snapshot_v$version")
  }

  def readMeta(root: String, version: Long): CommitMeta = {
    val f = metaFile(root, version)
    if (f.exists()) {
      val lines = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).linesIterator.toSeq
      CommitMeta(lines.head.toLong, lines(1).toLong,
        lines.drop(2).map(_.toLong).toSet)
    } else {
      // compacted away: serve from the newest checkpoint covering it
      val ckpt = Option(logDir(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".ckpt"))
        .map(c => c.getName.stripPrefix("checkpoint_")
          .stripSuffix(".ckpt").toLong -> c)
        .filter(_._1 >= version)
        .sortBy(_._1).headOption
        .getOrElse(throw new IllegalStateException(
          s"no meta or checkpoint for version $version"))._2
      new String(Files.readAllBytes(ckpt.toPath), StandardCharsets.UTF_8)
        .linesIterator
        .map(_.split("\\|", -1))
        .find(_.head.toLong == version)
        .map(p => CommitMeta(p(0).toLong, p(1).toLong,
          if (p(2).isEmpty) Set.empty
          else p(2).split(",").map(_.toLong).toSet))
        .getOrElse(throw new IllegalStateException(
          s"version $version missing from checkpoint ${ckpt.getName}"))
    }
  }

  /** Log compaction (the Delta checkpoint idea): squash every commit
    * meta ≤ the latest committed version into ONE checkpoint file and
    * delete the per-version metas, bounding log-directory file count
    * for long-lived tables. Read-set validation is unaffected —
    * [[readMeta]] transparently serves compacted versions from the
    * checkpoint. Commit markers stay (they are the visibility
    * source of truth and one byte each). Returns the checkpointed
    * version. */
  def checkpoint(root: String): Long = {
    val v = latestCommitted(root)
    require(v >= 0, "nothing to checkpoint")
    val body = (0L to v).map { u =>
      val m = readMeta(root, u)
      s"${m.version}|${m.readVersion}|${m.writtenKeys.toSeq.sorted.mkString(",")}"
    }.mkString("\n")
    val f = new File(logDir(root), s"checkpoint_$v.ckpt")
    Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8))
    // only delete after the checkpoint is durably in place
    (0L to v).foreach(u => metaFile(root, u).delete())
    v
  }

  /** OPTIMIZE (small-file compaction): commit a new version whose
    * snapshot is the latest state bin-packed into `targetFiles`
    * hash-partitioned files — same rows, better layout. The delta is
    * EMPTY and the written-key set is EMPTY, so an optimize never
    * conflicts with any concurrent data commit (read-set validation
    * sees no overlap) — exactly how lakehouse formats make OPTIMIZE
    * a background citizen. Goes through the same claim/marker
    * protocol as a data commit (atomic, crash-invisible). Returns
    * the new version.
    *
    * Scale note (100 TB): compaction cost is a read+write of the
    * live data ONLY (no shuffle beyond the repartition), and the
    * hash-by-key layout means a downstream keyed join/agg can reuse
    * the partitioning. A real multi-TB table would compact per
    * partition-bucket; the claim protocol and empty-write-set
    * conflict rule carry over unchanged. */
  def optimize(spark: SparkSession, root: String,
      targetFiles: Int, maxAttempts: Int = 10): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val v = latestCommitted(root) + 1
      require(v > 0, "nothing to optimize")
      if (claimFile(root, v).createNewFile()) {
        val heartbeat = startHeartbeat(claimFile(root, v), 30000L)
        try {
          val prev = read(spark, root, v - 1)
          prev.repartition(targetFiles, col("key"))
            .write.mode("overwrite").parquet(s"$root/snapshot_v$v")
          // empty delta: optimize changes layout, not content
          emptySnapshot(spark).withColumn("op", lit("upsert")).limit(0)
            .write.mode("overwrite").parquet(s"$root/delta_v$v")
          writeMeta(root, CommitMeta(v, v - 1, Set.empty))
          commitMarker(root, v).createNewFile()
          return v
        } finally heartbeat.interrupt()
      }
      Thread.sleep(20)
    }
    throw new Conflict(s"optimize gave up after $maxAttempts attempts")
  }

  /** Retention vacuum: delete snapshot + delta data for all versions
    * older than the last `keepLast` committed ones. Markers and metas
    * stay (history remains auditable; the data is what storage pays
    * for) — a time-travel read of a vacuumed version fails with the
    * descriptive error in [[read]]. Returns the evicted versions. */
  def vacuum(root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val latest = latestCommitted(root)
    val evict = 0L to (latest - keepLast)
    evict.foreach { v =>
      destroyDir(new File(root, s"snapshot_v$v"))
      destroyDir(new File(root, s"delta_v$v"))
    }
    evict
  }

  private def writeMeta(root: String, meta: CommitMeta): Unit = {
    val body = (Seq(meta.version.toString, meta.readVersion.toString) ++
      meta.writtenKeys.toSeq.sorted.map(_.toString)).mkString("\n")
    Files.write(metaFile(root, meta.version).toPath,
      body.getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Apply a keyed delta (key, value, op ∈ upsert|delete) to a
    * snapshot (key, value): upserts replace, deletes remove,
    * untouched keys carry over. */
  def applyDelta(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val spark = snapshot.sparkSession
    import spark.implicits._
    snapshot.as("s").join(delta.as("d"), Seq("key"), "full_outer")
      .filter(coalesce($"d.op", lit("upsert")) =!= "delete")
      .select($"key",
        coalesce($"d.value", $"s.value").as("value"))
  }

  /** One optimistic transaction. `txn` maps the base snapshot to
    * (delta, readKeys): the delta to commit and the keys the
    * transaction's result DEPENDS on (its read set). Loops:
    * read latest → build → claim; on a lost claim, validates the
    * read set against every intervening commit's written keys —
    * rebase (reuse the delta) when disjoint, full re-run when
    * overlapping (the lost update that blind last-writer-wins would
    * silently absorb). `barrier`, when set, is awaited between
    * snapshot read and claim — the test hook that forces two writers
    * into a genuine race deterministically. */
  def commit(spark: SparkSession, root: String,
      txn: DataFrame => (DataFrame, Set[Long]),
      barrier: Option[java.util.concurrent.CyclicBarrier] = None,
      maxAttempts: Int = 10,
      txnId: Option[String] = None,
      claimTimeoutMs: Long = 30000L,
      check: Option[org.apache.spark.sql.Column] = None): TxnStats = {
    // idempotent retry: an application txn id that already committed
    // returns its version without touching the log (attempts = 0 is
    // the caller-visible proof nothing re-applied)
    txnId.flatMap(committedTxn(root, _)) match {
      case Some(v) => return TxnStats(v, 0, 0)
      case None =>
    }
    var attempts = 0
    var conflicts = 0
    var pending: Option[(DataFrame, Set[Long], Long)] = None // delta, readKeys, builtAt
    while (attempts < maxAttempts) {
      attempts += 1
      val base = latestCommitted(root)
      val pair: (DataFrame, Set[Long]) = pending match {
        case Some((d, rk, builtAt)) =>
          // rebase path: the delta was built at `builtAt`; valid iff
          // no commit in (builtAt, base] wrote into our read set
          val clash = ((builtAt + 1) to base).exists(v =>
            readMeta(root, v).writtenKeys.exists(rk.contains))
          if (clash) {
            conflicts += 1
            pending = None
            val snap =
              if (base < 0) emptySnapshot(spark)
              else read(spark, root, base)
            val built = txn(snap)
            pending = Some((built._1, built._2, base))
            built
          } else (d, rk)
        case None =>
          val snap =
            if (base < 0) emptySnapshot(spark)
            else read(spark, root, base)
          val built = txn(snap)
          pending = Some((built._1, built._2, base))
          built
      }
      val delta = pair._1
      val readKeys = pair._2
      // the race-pinning hook trips once, on the writers' FIRST
      // attempts — a retrying loser must not wait on a partner that
      // already committed and left
      if (attempts == 1) barrier.foreach(_.await())
      val v = latestCommitted(root) + 1
      if (claimFile(root, v).createNewFile()) {
        // we own version v; heartbeat the claim's mtime while we work
        // so waiting writers can tell "slow" from "dead"
        val heartbeat = startHeartbeat(claimFile(root, v), claimTimeoutMs)
        try {
          // validate the read set against commits we did not see when
          // the delta was built
          val builtAt = pending.get._3
          val clash = ((builtAt + 1) until v).exists(u =>
            readMeta(root, u).writtenKeys.exists(readKeys.contains))
          if (clash) {
            // release the claim and re-run against the newer snapshot
            claimFile(root, v).delete()
            conflicts += 1
            pending = None
          } else {
            val prevSnap =
              if (v == 0) emptySnapshot(spark)
              else read(spark, root, v - 1)
            val keyed = delta.localCheckpoint(true)
            val post = applyDelta(prevSnap, keyed)
            // CHECK constraint: enforced on the POST state, before
            // anything becomes visible; a violating commit releases
            // its claim and rejects — the log is left untouched
            check.foreach { c =>
              val bad = post.filter(!c).limit(1).count()
              if (bad > 0) {
                claimFile(root, v).delete()
                throw new CheckViolation(
                  s"commit v$v rejected: post-state violates CHECK $c")
              }
            }
            post.write.mode("overwrite")
              .parquet(s"$root/snapshot_v$v")
            keyed.write.mode("overwrite").parquet(s"$root/delta_v$v")
            writeMeta(root, CommitMeta(v, builtAt, pending.get._2))
            txnId.foreach(id => Files.write(txnIdFile(root, v).toPath,
              id.getBytes(StandardCharsets.UTF_8)))
            commitMarker(root, v).createNewFile()
            return TxnStats(v, attempts, conflicts)
          }
        } finally heartbeat.interrupt()
      }
      else {
        // lost the claim: wait for its owner to finish (marker) or
        // release (claim gone) rather than burning attempts spinning
        val t0 = System.nanoTime()
        while (claimFile(root, v).exists() &&
            !commitMarker(root, v).exists() &&
            (System.nanoTime() - t0) < claimTimeoutMs * 1000000L)
          Thread.sleep(math.min(20L, math.max(claimTimeoutMs / 8, 1L)))
        // age-checked claim steal: a live owner heartbeats the mtime
        // every claimTimeoutMs/4, so a claim whose mtime is a full
        // claimTimeoutMs old belongs to a crashed writer — delete it
        // and let the loop re-claim the freed slot
        val orphan = claimFile(root, v)
        if (orphan.exists() && !commitMarker(root, v).exists() &&
            System.currentTimeMillis() - orphan.lastModified() >=
              claimTimeoutMs) {
          orphan.delete(); ()
        }
      }
      // loop re-validates against the new latest and retries
    }
    throw new Conflict(s"gave up after $maxAttempts attempts")
  }

  /** Daemon thread refreshing `claim`'s mtime every `timeoutMs/4`
    * while the owning commit runs — the liveness signal the
    * age-checked claim steal in `commit` keys off. */
  private def startHeartbeat(claim: File, timeoutMs: Long): Thread = {
    val t = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          claim.setLastModified(System.currentTimeMillis())
          Thread.sleep(math.max(timeoutMs / 4, 5L))
        }
      } catch { case _: InterruptedException => }
    }, s"txn-claim-heartbeat-${claim.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  def emptySnapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("key", "value")
  }

  /** Remove a table root recursively (test/operator scratch). */
  def destroy(root: String): Unit = destroyDir(new File(root))

  private def destroyDir(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(destroyDir)
    f.delete(); ()
  }
}
