package graft.plans

import java.util.concurrent.CountDownLatch

import graft.SparkSpec

/** Gate semantics for the clearCache/materialization serializer (the
  * round-10 battery deadlock fix). The ABBA itself can't be reproduced
  * deterministically in a unit test (it needs a task failure inside
  * buildBuffers racing a clearCache), so the spec certifies the invariant
  * that precludes it: tryClear never runs while a query action is in
  * flight, runs as soon as none is, and emergencyUnpersist frees tracked
  * blocks without the gate. */
class CacheHygieneSpec extends SparkSpec {

  test("tryClear is refused while a query holds the read gate, allowed after") {
    val inside = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val t = new Thread(() => CacheHygiene.withQuery {
      inside.countDown()
      release.await()
    })
    t.setDaemon(true)
    t.start()
    inside.await()
    assert(!CacheHygiene.tryClear(spark, 0),
      "clearCache must not run concurrently with a query action")
    release.countDown()
    t.join(10000)
    assert(CacheHygiene.tryClear(spark, 5),
      "clearCache must run once the gate is free")
  }

  test("concurrent readers don't exclude each other") {
    val both = new CountDownLatch(2)
    val release = new CountDownLatch(1)
    val ts = (1 to 2).map { _ =>
      val t = new Thread(() => CacheHygiene.withQuery {
        both.countDown()
        release.await()
      })
      t.setDaemon(true)
      t.start()
      t
    }
    both.await() // would hang here if the gate serialized queries
    release.countDown()
    ts.foreach(_.join(10000))
  }

  test("emergencyUnpersist frees tracked RDD blocks without the gate") {
    import spark.implicits._
    // Assert on the RDD ids THIS test persisted, not on a global "nothing
    // non-checkpointed remains" property of the shared SparkSession: a
    // concurrent suite (or a later-added fixture) persisting an RDD
    // between the call and the assertion would flake the global form
    // (round-10 advisor).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 1000).toDF("x").persist()
    df.count()
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty, "persist+count registered no new persistent RDD")
    // simulate a zombie holding the gate: emergency relief must still work
    val release = new CountDownLatch(1)
    val inside = new CountDownLatch(1)
    val t = new Thread(() => CacheHygiene.withQuery {
      inside.countDown(); release.await()
    })
    t.setDaemon(true)
    t.start()
    inside.await()
    try {
      assert(CacheHygiene.emergencyUnpersist(spark) >= 1)
      // this test's RDDs are plain persists (never checkpointed), so the
      // relief must have dropped exactly them from the tracked set
      val left = spark.sparkContext.getPersistentRDDs.keySet intersect mine
      assert(left.isEmpty, s"this test's persisted RDD ids survived: $left")
    } finally {
      release.countDown()
      t.join(10000)
    }
  }
}
