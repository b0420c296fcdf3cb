package graft.reddit

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.operators.Relational

/** SURVEY §5.2 property tests: the upsert algebra, driven by ScalaCheck
  * generators directly (fixed seed → reproducible; no scalatestplus bridge
  * needed offline).
  *
  * Case budget: `GRAFT_PROP_CASES` (default 12) — CI runs the default on
  * every change and a 200-case sweep once per round (see README).
  */
class UpsertPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val nCases: Int = sys.env.getOrElse("GRAFT_PROP_CASES", "12").toInt

  private val kv: Gen[List[(String, Int)]] = for {
    n <- Gen.chooseNum(0, 10)
    ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    vs <- Gen.listOfN(n, Gen.chooseNum(0, 1000))
  } yield ks.zip(vs).toMap.toList // unique keys per side

  private def cases(g: Gen[List[(String, Int)]], n: Int): Seq[List[(String, Int)]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("upsert(upsert(T,B),B) == upsert(T,B); keys unique; last write wins") {
    val ts = cases(kv, nCases)
    val bs = cases(kv, nCases)
    ts.zip(bs).foreach { case (tRows, bRows) =>
      val t = tRows.toDF("id", "v")
      val b = bRows.toDF("id", "v")
      val once = Relational.upsert(t, b, "id").as[(String, Int)].collect().toMap
      val onceRows = Relational.upsert(t, b, "id").count()
      val twice = Relational.upsert(
        Relational.upsert(t, b, "id"), b, "id").as[(String, Int)].collect().toMap
      val expect = tRows.toMap ++ bRows.toMap
      assert(once == expect, s"t=$tRows b=$bRows")
      assert(twice == expect, s"idempotence failed: t=$tRows b=$bRows")
      assert(onceRows == expect.size, "duplicate keys after upsert")
    }
  }
}
