package graft.operators

import graft.SparkSpec

/** Pins IterScale's two contracts: the sizing math (never below the
  * session baseline, capped, ~RowsPerPartition rows per partition) and
  * the restore discipline — the conf returns to the SESSION BASELINE
  * even when scaled scopes overlap (graft.Verify runs 8 queries
  * concurrently in one session; a naive save/restore can capture
  * another call's temporary value and leave the session scaled). */
class IterScaleSpec extends SparkSpec {

  test("scaledParts: baseline floor, linear middle, hard cap") {
    assert(IterScale.scaledParts(32, 0L) === 32)
    assert(IterScale.scaledParts(32, 1000000L) === 32) // below one unit
    assert(IterScale.scaledParts(32, 48 * IterScale.RowsPerPartition) === 48)
    assert(IterScale.scaledParts(32,
      120000000L) === 80) // the sf10 BFS graph: 120M edges -> 80
    assert(IterScale.scaledParts(32, Long.MaxValue / 4) ===
      IterScale.MaxPartitions)
    assert(IterScale.scaledParts(256, 1000000L) === 256) // big session wins
  }

  test("withEdgeScaledShuffle sets inside the scope and restores the baseline") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val rows = 100L * IterScale.RowsPerPartition
    IterScale.withEdgeScaledShuffle(spark, rows) {
      assert(spark.conf.get(key).toInt >= 100)
    }
    assert(spark.conf.get(key) === before)
  }

  test("a legitimate session change OUTSIDE any scope refreshes the baseline") {
    // round-14 advisor: the first-seen baseline was permanent, so a user's
    // later conf change was silently reverted by the next scaled call
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      // prime the cached baseline with the current value
      IterScale.withEdgeScaledShuffle(spark, 100L * IterScale.RowsPerPartition) {}
      // the user legitimately re-tunes the session between operator calls
      val retuned = before.toInt + 7
      spark.conf.set(key, retuned.toString)
      IterScale.withEdgeScaledShuffle(spark, 100L * IterScale.RowsPerPartition) {
        assert(spark.conf.get(key).toInt >= 100)
      }
      // the restore must target the RETUNED value, not the stale baseline
      assert(spark.conf.get(key).toInt === retuned)
    } finally spark.conf.set(key, before)
  }

  test("nested scopes restore the BASELINE, not the inner temporary value") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    IterScale.withEdgeScaledShuffle(spark, 100L * IterScale.RowsPerPartition) {
      // a second scaled scope opens while the first is active — the
      // concurrent-Verify interleaving in miniature
      IterScale.withEdgeScaledShuffle(spark, 200L * IterScale.RowsPerPartition) {
        assert(spark.conf.get(key).toInt >= 200)
      }
      // the inner restore must NOT have pinned the outer's 100
      assert(spark.conf.get(key) === before)
    }
    assert(spark.conf.get(key) === before)
  }
}
