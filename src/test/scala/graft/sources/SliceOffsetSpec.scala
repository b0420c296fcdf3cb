package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint offsets must always re-parse their own json() — including
  * legacy bare-number offsets and identities with JSON-active characters
  * in the file name.
  */
class SliceOffsetSpec extends AnyFunSuite {

  test("json round-trips, including quotes and backslashes in identities") {
    Seq(
      SliceOffset(0L, None),
      SliceOffset(7L, Some("part-0001.parquet#3")),
      SliceOffset(2L, Some("a\"b.parquet#0")),
      SliceOffset(5L, Some("""weird\name".parquet#12"""))
    ).foreach { o =>
      assert(SliceOffset.parse(o.json()) == o, s"round-trip failed for $o")
    }
  }

  test("legacy bare-number checkpoints parse without an identity") {
    assert(SliceOffset.parse("42") == SliceOffset(42L, None))
    assert(SliceOffset.parse(" 3 ") == SliceOffset(3L, None))
  }
}
