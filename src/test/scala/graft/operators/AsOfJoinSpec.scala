package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 1L, 100L), // key 1, t=100
    (2L, 1L, 200L),
    (3L, 2L, 150L),
    (4L, 3L, 50L) // key 3 has no right rows
  ).toDF("lid", "k", "t")

  private def right = Seq(
    (10L, 1L, 100L), // exactly at left t=100 → matches (<=)
    (11L, 1L, 100L), // same time: greater tiebreaker (11) wins
    (12L, 1L, 150L),
    (13L, 2L, 149L),
    (14L, 2L, 151L) // after left t=150 → must not match
  ).toDF("rid", "k", "rt")

  test("backward: <= semantics, tie goes to greatest tiebreaker, null when none") {
    val out = AsOfJoin.backward(left, right,
      key = "k", leftTime = "t", rightTime = "rt",
      rightPayload = Seq("rid", "rt"),
      leftTieBreak = "lid", rightTieBreak = "rid")
      .orderBy("lid")
      .select("lid", "asof_rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))

    assert(out.toSeq === Seq(
      (1L, 11L), // t=100: rows 10,11 at 100 → last carried = 11
      (2L, 12L), // t=200: latest ≤ 200 is 12 (t=150)
      (3L, 13L), // t=150: 149 matches, 151 does not
      (4L, -1L) // no right rows for key 3
    ))
  }

  test("backward: non-numeric (string) tiebreaker stays orderable") {
    import spark.implicits._
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val r = Seq(("a", 1L, 100L), ("b", 1L, 100L)).toDF("rid", "k", "rt")
    val out = AsOfJoin.backward(l, r, "k", "t", "rt",
      Seq("rid"), "lid", "rid").collect()
    assert(out.head.getAs[String]("asof_rid") === "b") // greatest string wins
  }

  test("backward: preserves all left rows and columns") {
    val out = AsOfJoin.backward(left, right, "k", "t", "rt",
      Seq("rid"), "lid", "rid")
    assert(out.count() === 4)
    assert(out.columns.toSet === Set("lid", "k", "t", "asof_rid"))
  }

  test("forward: >= semantics, tie goes to smallest tiebreaker, null when none") {
    val out = AsOfJoin.forward(left, right,
      key = "k", leftTime = "t", rightTime = "rt",
      rightPayload = Seq("rid", "rt"),
      leftTieBreak = "lid", rightTieBreak = "rid")
      .orderBy("lid")
      .select("lid", "asof_rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))

    assert(out.toSeq === Seq(
      (1L, 10L), // t=100: rows 10,11 at 100 → first = smallest tiebreak 10
      (2L, -1L), // t=200: no right row at/after 200
      (3L, 14L), // t=150: 151 is the next at/after (149 is before)
      (4L, -1L) // no right rows for key 3
    ))
  }

  test("tolerance: matches beyond the horizon are nulled, closer ones kept") {
    val joined = AsOfJoin.forward(left, right, "k", "t", "rt",
      Seq("rid", "rt"), "lid", "rid")
    val out = AsOfJoin.applyTolerance(joined, "t", "asof_rt",
      org.apache.spark.sql.functions.lit(0L), Seq("asof_rid", "asof_rt"),
      forwardDir = true)
      .orderBy("lid").select("lid", "asof_rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // tol=0 → only exact-time matches survive
    assert(out.toSeq === Seq((1L, 10L), (2L, -1L), (3L, -1L), (4L, -1L)))
  }
}
