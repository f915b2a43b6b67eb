package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    ("a", 10L, 100L), ("a", 20L, 101L), ("a", 5L, 102L), ("b", 7L, 103L))
    .toDF("k", "lts", "lid")
  private val right = Seq(
    ("a", 10L, 1L, 1.5), ("a", 10L, 2L, 2.5), // tie at ts=10 → larger rid wins
    ("a", 15L, 3L, 3.5), ("c", 1L, 9L, 9.9))
    .toDF("k", "rts", "rid", "rv")

  test("as-of semantics: latest right at-or-before, ties by tiebreak, null when none") {
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("rid", "rv"), "rid")
      .orderBy("k", "lid").collect()
      .map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 100L, 2L),  // lts=10: equality qualifies, tie → rid 2
      ("a", 101L, 3L),  // lts=20: latest is rts=15
      ("a", 102L, -1L), // lts=5: nothing at-or-before
      ("b", 103L, -1L)))// no right rows for key b
  }

  test("null field in latest right row does NOT fall back to an older row") {
    // latest right row (ts=15) has rv=null: asof_rv must be null too, not
    // 2.5 from the older ts=10 row — all asof_* fields come from ONE row
    val r2 = Seq(("a", 10L, Some(2L), Some(2.5)), ("a", 15L, Some(3L), None))
      .toDF("k", "rts", "rid", "rv")
    val l2 = Seq(("a", 20L, 1L)).toDF("k", "lts", "lid")
    val out = AsOfJoin.asOf(l2, r2, "k", "lts", "rts", Seq("rid", "rv"), "rid")
      .collect().head
    assert(out.getAs[Long]("asof_rid") === 3L)
    assert(out.isNullAt(out.fieldIndex("asof_rv")))
  }

  test("right-only keys produce no output rows; left row count preserved") {
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("rv"), "rid")
    assert(out.count() === left.count())
    assert(!out.select("k").as[String].collect().contains("c"))
  }

  test("tolerance: stale latest match nulls out instead of falling back to an even older row") {
    // lts=20 with tol=4: latest right is rts=15 (age 5, stale). The ts=10
    // row is in no sense a better match — tolerance must null, not scan
    // back. lts=20 with tol=5: rts=15 qualifies, age=5.
    val strict = AsOfJoin.asOfTolerance(left, right, "k", "lts", "rts",
      Seq("rid", "rv"), "rid", toleranceUs = 4L).orderBy("k", "lid").collect()
    val loose = AsOfJoin.asOfTolerance(left, right, "k", "lts", "rts",
      Seq("rid", "rv"), "rid", toleranceUs = 5L).orderBy("k", "lid").collect()
    def rid(rows: Array[org.apache.spark.sql.Row], lid: Long): Option[Long] =
      rows.find(_.getLong(2) == lid).flatMap(r =>
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong))
    assert(rid(strict, 101L).isEmpty)          // age 5 > tol 4 → no match
    assert(rid(loose, 101L).contains(3L))      // age 5 <= tol 5 → rts=15 row
    assert(rid(strict, 100L).contains(2L))     // age 0 always fresh
    val age = loose.find(_.getLong(2) == 101L).get.getAs[Long]("asof_age_us")
    assert(age === 5L)
    // zero-match rows still present with null age (left row count preserved)
    assert(strict.length === left.count())
  }

  test("tolerance ≡ plain as-of followed by the staleness gate (differential)") {
    val plain = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("rid"), "rid")
      .collect().map(r => (r.getString(0), r.getLong(2),
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong))).toSet
    val tol = AsOfJoin.asOfTolerance(left, right, "k", "lts", "rts",
      Seq("rid"), "rid", toleranceUs = Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(2),
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong))).toSet
    assert(plain == tol) // infinite tolerance degenerates to plain as-of
  }
}
