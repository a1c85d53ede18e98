package graft.quality

import graft.SparkSpec

/** Port of the reference's validator unit tests (SURVEY.md §5; ref:
  * etl/tests/test_transform.py — unique-PK incl. composite keys and empty
  * frames, non-null-PK per level, raise-vs-log wrapper). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateKeys: unique single key → empty") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    assert(Checks.duplicateKeys(df, Seq("k")).count() === 0)
    assert(Checks.isUniqueKey(df, Seq("k")))
  }

  test("duplicateKeys: duplicated single key → reported with multiplicity") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val dups = Checks.duplicateKeys(df, Seq("k")).collect()
    assert(dups.length === 1)
    assert(dups.head.getInt(0) === 1)
    assert(dups.head.getLong(1) === 2L)
  }

  test("duplicateKeys: composite key uniqueness (MultiIndex analogue)") {
    val ok = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "c")).toDF("k1", "k2", "v")
    assert(Checks.isUniqueKey(ok, Seq("k1", "k2")))
    val bad = Seq((1, 1, "a"), (1, 1, "b")).toDF("k1", "k2", "v")
    assert(!Checks.isUniqueKey(bad, Seq("k1", "k2")))
  }

  test("duplicateKeys: empty frame → unique") {
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    assert(Checks.isUniqueKey(df, Seq("k")))
  }

  test("hasNoNullKeys: nulls on any level detected") {
    val df = Seq((Some(1), Some(1)), (None, Some(2)), (Some(3), None))
      .toDF("k1", "k2")
    assert(!Checks.hasNoNullKeys(df, Seq("k1", "k2")))
    assert(!Checks.hasNoNullKeys(df, Seq("k1")))
    assert(Checks.hasNoNullKeys(df.filter($"k1".isNotNull && $"k2".isNotNull),
      Seq("k1", "k2")))
  }

  test("nullKeyCounts: per-key counts + total") {
    val df = Seq((Some(1), "a"), (None, "b"), (None, "c")).toDF("k", "v")
    val row = Checks.nullKeyCounts(df, Seq("k")).collect().head
    assert(row.getLong(0) === 2L) // null_k
    assert(row.getLong(1) === 3L) // n_rows
  }

  test("enforce: raiseErrors=true throws, false logs") {
    var warned: List[String] = Nil
    assert(Checks.enforce("ok-check", ok = true, raiseErrors = true))
    assertThrows[IllegalStateException] {
      Checks.enforce("bad-check", ok = false, raiseErrors = true)
    }
    assert(!Checks.enforce("bad-check", ok = false, raiseErrors = false,
      warn = m => warned = m :: warned))
    assert(warned.exists(_.contains("bad-check")))
  }

  test("fkOrphans: orphan keys grouped with counts") {
    val child = Seq((1, "x"), (2, "y"), (2, "z"), (9, "w")).toDF("fk", "v")
    val parent = Seq(1, 2).toDF("pk")
    val orphans = Checks.fkOrphans(child, parent, "fk", "pk").collect()
    assert(orphans.length === 1)
    assert(orphans.head.getInt(0) === 9)
  }

  test("dedupKeepFirst: keeps first row per key under explicit order") {
    val df = Seq((1, 10, "late"), (1, 5, "early"), (2, 7, "only"))
      .toDF("k", "ord", "v")
    val out = Checks.dedupKeepFirst(df, Seq("k"), Seq("ord"))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("early", "only"))
  }
}
