package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property tests for the curation algebra (ScalaCheck generators driven
  * directly with fixed seeds — reproducible, no bridge dependency).
  *
  * Case budget: `GRAFT_PROP_CASES` (default 12 seeds per property) — CI
  * runs the default on every change and a 200-case sweep once per round
  * (see README).
  */
class CurationPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val nCases: Int = sys.env.getOrElse("GRAFT_PROP_CASES", "12").toInt

  private def longs(n: Int, seed: Long): List[Long] =
    Gen.listOfN(n, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
      .apply(Gen.Parameters.default, Seed(seed)).get.distinct

  test("hexThreshold is monotone in pct and width-consistent") {
    val pcts = Seq(0.0, 0.004, 1.0, 10.0, 33.3, 50.0, 80.0, 99.99, 100.0)
    Seq(2, 4, 8).foreach { d =>
      val ts = pcts.map(Curation.hexThreshold(_, d))
      assert(ts == ts.sorted, s"not monotone at digits=$d: $ts")
      ts.filterNot(_ == "g").foreach(t => assert(t.length == d))
    }
  }

  test("hexThreshold rejects negative pct instead of silently inverting the sample") {
    intercept[IllegalArgumentException](Curation.hexThreshold(-0.1, 4))
  }

  test("trainingOrder: positions are a stable permutation of 0..n-1, repartition-invariant") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val out = Curation.trainingOrder(docs, "doc_id")
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted == (0L until 500L))
    // content-stable: physical layout must not change the order
    val reshuffled = Curation.trainingOrder(docs.repartition(13), "doc_id")
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reshuffled == out)
    // hash order, not ingest order: the identity permutation would mean
    // the hash did nothing
    assert(out.exists { case (id, pos) => id != pos })
  }

  test("splitAssign is a total partition for arbitrary keys (incl. negatives)") {
    (1L to nCases).foreach { seed =>
      val ids = longs(400, seed).toDF("id")
      val out = Curation.splitAssign(ids, "id")
      assert(out.count() == ids.count())
      assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    }
  }

  test("sampleByHash nests across fractions for arbitrary keys") {
    (1L to math.max(1L, nCases / 4L)).foreach { seed =>
      val keys = longs(500, seed * 42L) // chooseNum biases to special values → dedup
      val ids = keys.toDF("id")
      val fracs = Seq(0.05, 0.2, 0.5, 0.9, 1.0)
      val kept = fracs.map(f =>
        Curation.sampleByHash(ids, "id", f).as[Long].collect().toSet)
      kept.sliding(2).foreach { case Seq(a, b) =>
        assert(a.subsetOf(b), "larger fraction must contain the smaller sample")
      }
      assert(kept.last.size == keys.size, "fraction 1.0 must keep everything")
    }
  }

  test("pow2Bin invariant: bin ≤ n < 2·bin inside the capped range") {
    val ns = (0L to 300L) ++ Seq(1023L, 1024L, 4095L, 4096L)
    val rows = ns.toDF("n")
      .select(col("n"), Curation.pow2Bin(col("n")).as("bin"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, bin) =>
      if (n <= 0) assert(bin == 0L)
      else if (n >= 4096) assert(bin == 4096L)
      else assert(bin <= n && n < 2 * bin, s"n=$n bin=$bin")
    }
  }

  test("epochsMix output size = sum of per-stratum whole copies + fractional slice") {
    val df = Seq.tabulate(300)(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("s", "id")
    val out = Curation.epochsMix(df, "s", "id", Map("a" -> 3.0, "b" -> 0.0))
    // integral epochs: exactly 3 copies of every 'a' row, zero 'b'
    assert(out.count() == 450L)
    assert(out.filter(col("s") === "b").count() == 0L)
  }
}
