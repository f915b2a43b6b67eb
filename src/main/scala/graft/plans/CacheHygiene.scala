package graft.plans

import java.util.concurrent.TimeUnit
import java.util.concurrent.locks.ReentrantReadWriteLock

import org.apache.spark.sql.SparkSession

/** Serializes `spark.catalog.clearCache()` against in-flight query actions.
  *
  * Round-10 postmortem (self-run battery, first execution of the
  * sticky-cancel harness): after a wall-boxed kill, the abandoned worker
  * thread was still inside `CachedRDDBuilder.buildBuffers` — it HOLDS the
  * builder's monitor and, on the cancellation-induced task failure, calls
  * back into `CacheManager.recacheByPlan`, which needs the CacheManager
  * monitor. The sweep's main thread was simultaneously inside
  * `spark.catalog.clearCache()` (the between-query hygiene), which takes
  * exactly the same two monitors in the OPPOSITE order (CacheManager →
  * each entry's builder). Classic ABBA: both threads blocked forever and
  * the whole battery hung at 230-odd queries of work (jstack-confirmed,
  * `Found one Java-level deadlock` on this box).
  *
  * The fix is lock-ordering by construction: every query action runs
  * under the READ lock; `clearCache` runs only under the WRITE lock, so
  * it can never overlap a live materialization. A zombie that outlives
  * its cancellation simply keeps the read lock until its failure unwinds
  * — `tryClear` then gives up after a bounded wait (no deadlock, the
  * sweep continues) and the next between-query boundary retries. When the
  * gate cannot be taken, [[emergencyUnpersist]] offers BlockManager-level
  * pressure relief: `RDD.unpersist` does not touch the SQL CacheManager
  * or builder monitors, so it is safe to run concurrently with anything;
  * stale CacheManager metadata then recomputes on access (slower, never
  * wrong).
  */
object CacheHygiene {
  // FAIR (r16, verdict #7): under Verify's 8-wide concurrent sweep the
  // write lock was starved by construction — non-fair readers barge past
  // a waiting writer, so with 8 slots always occupied the periodic
  // clearCache ~never ran and the emergency BlockManager unpersist fired
  // instead (3× per 249-query sweep in the r15 driver log, the same
  // leaked-pin pressure class as the round-9 phantom outliers). Fair mode
  // queues new readers behind the waiting writer, so the in-flight
  // queries drain (sub-second each in verify) and the deterministic
  // CacheManager clear runs. Lock traffic is per-query, not per-row —
  // fairness costs nothing measurable here.
  private val lock = new ReentrantReadWriteLock(true)

  /** Run a query action (plan build + job) under the read gate. */
  def withQuery[T](body: => T): T = {
    lock.readLock().lock()
    try body finally lock.readLock().unlock()
  }

  /** Clear the SQL cache iff no query action is in flight within
    * `waitSec`; returns whether the clear ran. */
  def tryClear(spark: SparkSession, waitSec: Long): Boolean = {
    val wl = lock.writeLock()
    val got =
      try wl.tryLock(waitSec, TimeUnit.SECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
      }
    if (got) {
      try spark.catalog.clearCache() finally wl.unlock()
      true
    } else false
  }

  /** Lock-free storage relief for when [[tryClear]] is blocked by a
    * zombie: unpersist tracked RDDs (includes the SQL cache's
    * column-buffer RDDs) straight at the BlockManager, non-blocking.
    *
    * Checkpointed RDDs are SKIPPED: a (local)checkpoint's blocks are the
    * ONLY copy of the data — lineage is truncated — so unpersisting one
    * under an in-flight peer is unrecoverable data loss, not cache
    * eviction (first smoke run: q_ppr_seeds died with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Everything else recomputes from
    * its parquet-rooted lineage if re-read. */
  def emergencyUnpersist(spark: SparkSession): Int = {
    val safe = spark.sparkContext.getPersistentRDDs.values.toSeq
      .filterNot { r =>
        // isLocallyCheckpointed is true from the localCheckpoint() CALL
        // (covers the pending window before materialization flips
        // isCheckpointed); keep anything Spark could not rebuild
        try org.apache.spark.rdd.GraftRddIntrospect.isAnyCheckpointed(r)
        catch { case _: Throwable => true }
      }
    safe.foreach { r => try r.unpersist(false) catch { case _: Throwable => () } }
    safe.size
  }
}
