package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference bracket-subscript / slice / list-function
  * semantics (list_extract.cpp, array_slice.cpp) that the imported
  * sqllogictest corpus relies on. */
class ListFnsSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").collect()(0).get(0)

  test("list subscript: 1-based, 0 and OOB -> NULL, negative from end") {
    assert(one("graft_subscript(array(10,20,30), 1)") == 10)
    assert(one("graft_subscript(array(10,20,30), 3)") == 30)
    assert(one("graft_subscript(array(10,20,30), 0)") == null)
    assert(one("graft_subscript(array(10,20,30), 4)") == null)
    assert(one("graft_subscript(array(10,20,30), -1)") == 30)
    assert(one("graft_subscript(array(10,20,30), -4)") == null)
    assert(one("graft_subscript(cast(null as array<int>), 1)") == null)
    assert(one("graft_subscript(array(10,20,30), cast(null as int))") == null)
  }

  test("map subscript: missing key -> NULL (no ANSI error)") {
    assert(one("graft_subscript(map('a', 1, 'b', 2), 'b')") == 2)
    assert(one("graft_subscript(map('a', 1), 'z')") == null)
    assert(one("graft_subscript(map(1, 'x'), 1)") == "x")
  }

  test("struct subscript: case-insensitive field") {
    assert(one("graft_subscript(named_struct('a', 1, 'b', 2), 'B')") == 2)
  }

  test("string subscript: grapheme, OOB -> empty") {
    assert(one("graft_subscript('abc', 2)") == "b")
    assert(one("graft_subscript('abc', -1)") == "c")
    assert(one("graft_subscript('abc', 0)") == "")
    assert(one("graft_subscript('abc', 9)") == "")
  }

  test("slice: inclusive 1-based, clamped, NULL bound open") {
    assert(one("graft_slice(array(1,2,3,4,5), 2, 3)") == Seq(2, 3))
    assert(one("graft_slice(array(1,2,3,4,5), 2, 10)") == Seq(2, 3, 4, 5))
    assert(one("graft_slice(array(1,2,3,4,5), null, 2)") == Seq(1, 2))
    assert(one("graft_slice(array(1,2,3,4,5), 4, null)") == Seq(4, 5))
    assert(one("graft_slice(array(1,2,3,4,5), -2, null)") == Seq(4, 5))
    assert(one("graft_slice(array(1,2,3,4,5), 4, 2)") == Seq())
    assert(one("graft_slice('abcde', 2, 3)") == "bc")
    assert(one("graft_slice('abcde', -3, null)") == "cde")
  }

  test("list functions: distinct/unique/position/contains/concat/sort") {
    assert(one("list_distinct(array(1, 1, null, 3, 1))") == Seq(1, 3))
    assert(one("list_unique(array(1, 1, null, 3))") == 2L)
    assert(one("list_position(array(10, 20), 20)") == 2)
    assert(one("list_position(array(10, 20), 99)") == null)
    assert(one("list_contains(array(1,2), 2)") == true)
    assert(one("contains('hello', 'ell')") == true)
    assert(one("contains(map('k', 1), 'k')") == true)
    assert(one("list_concat(array(1), cast(null as array<int>), array(2))") == Seq(1, 2))
    assert(one("list_sort(array(3, null, 1))") == Seq(null, 1, 3))
    assert(one("list_sort(array(3, null, 1), 'DESC', 'NULLS LAST')") == Seq(3, 1, null))
    assert(one("list_resize(array(1,2,3), 2)") == Seq(1, 2))
    assert(one("list_resize(array(1), 3, 0)") == Seq(1, 0, 0))
  }

  test("graft_concat: NULL-skipping scalar concat, incl. tz-aware casts") {
    assert(one("graft_concat('a', null, 'b')") == "ab")
    assert(one("graft_concat(1, '-', 2.5)") == "1-2.5")
    // TIMESTAMP argument: the hidden delegate's Cast(ts, STRING) is never
    // visited by ResolveTimeZone, so the zone must be pinned at
    // construction (regression: NoSuchElementException at eval)
    assert(one("graft_concat(timestamp '2024-01-02 03:04:05', '!')")
      == "2024-01-02 03:04:05!")
    assert(one("graft_concat(date '2024-01-02', '/x')") == "2024-01-02/x")
    assert(one("graft_concat(array(1), array(2, 3))") == Seq(1, 2, 3))
  }

  test("range/generate_series scalar form") {
    assert(one("range(4)") == Seq(0L, 1L, 2L, 3L))
    assert(one("range(2, 5)") == Seq(2L, 3L, 4L))
    assert(one("generate_series(2, 5)") == Seq(2L, 3L, 4L, 5L))
    assert(one("generate_series(5, 1, -2)") == Seq(5L, 3L, 1L))
    assert(one("range(0)") == Seq())
    assert(one("len('héllo')") == 5L)
    assert(one("len(array(1,2))") == 2L)
  }
}
