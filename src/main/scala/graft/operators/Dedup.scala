package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data curation: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash.
  *
  * Scale shape: per-document signatures are computed inside the row (array
  * higher-order functions — no explode, no shuffle); only the tiny
  * (doc → bucket) pairs shuffle for the LSH bucket join. At 100 TB the
  * candidate-pair stage touches a few permille of the corpus instead of
  * the O(n²) cross product.
  */
object Dedup {

  /** Exact dedup: group on the canonical fingerprint, keep the smallest id.
    * Plain two-phase hash aggregate — map-side partials make this scan-bound.
    */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id), TextAnalysis.fingerprint(col(text)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word k-shingles of a document (arrays stay in-row).
    * Pure-builtin formulation — [[graft.functions.word_shingles]] is the
    * codegen'd kernel used on the hot path, validated equal to this.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    when(n < k, array_distinct(when(n > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>"))))
      .otherwise(array_distinct(transform(
        sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
  }

  /** Exact Jaccard similarity of two distinct-token/shingle arrays.
    * Integer set sizes → one double division: bit-reproducible.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_distinct(concat(a, b))).cast("double")
    when(uni === 0d, lit(1.0)).otherwise(inter / uni)
  }

  /** All-pairs n-gram (token set) Jaccard over a bounded id range — the
    * exact-verification building block. The quadratic candidate space is
    * capped by `maxId`; at scale use [[minhashLsh]] to generate candidates
    * and this only on the (tiny) candidate set.
    */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
                        threshold: Double, maxId: Long): DataFrame = {
    // hard cap: this operator is O(n²) by design (exact verification) and
    // must only ever see an LSH-pruned candidate slice, never a corpus
    require(maxId <= 100000L,
      s"ngramJaccardPairs is quadratic — maxId=$maxId; use minhashLsh for candidate generation")
    val t = docs
      .filter(col(id) < maxId)
      .select(col(id), array_distinct(TextAnalysis.tokens(col(text))).as("toks"))
    val a = t.select(col(id).as("a_id"), col("toks").as("a_toks"))
    val b = t.select(col(id).as("b_id"), col("toks").as("b_toks"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_toks"), col("b_toks")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature: k independent hash slots, each the min of
    * xxhash64(shingle, slot) over the document's shingles. Computed entirely
    * in-row (transform + array_min) — stays inside whole-stage codegen.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      slot =>
        when(size(shinglesCol) === 0, lit(Long.MaxValue))
          .otherwise(array_min(transform(shinglesCol, s => xxhash64(s, slot)))))

  /** MinHash + LSH banding near-dup candidates, exact-verified.
    *
    * bands×rows = numHashes; two docs collide if any band of their
    * signatures matches. Collisions are found with a shuffle on
    * (band, bandHash) — the only shuffle in the pipeline — then verified
    * with exact Jaccard so the output has no false positives.
    */
  def minhashLsh(docs: DataFrame, id: String, text: String, shingleK: Int = 3,
                 numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {

    // (doc_id, band, bucket) — ids only. The token arrays must NOT ride
    // through the LSH exchange: at corpus scale that ships the tokenized
    // corpus ×bands through the shuffle. Candidates are found on ids and
    // tokens are re-joined afterwards, once, for verification.
    //
    // The signature+banding runs as one native codegen'd kernel
    // ([[graft.functions.MinHashBandsExpr]]): the equivalent
    // transform/array_min higher-order-function composition is evaluated
    // interpreted (Spark never codegens lambda bodies) at ~30× the cost,
    // and splitting signature and banding across projections gets
    // re-inlined by CollapseProject into a bands× recompute.
    val banded = docs
      .select(col(id).as("doc_id"),
        posexplode(graft.functions.minhash_bands(
          graft.functions.word_shingles(col(text), shingleK), numHashes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // one aggregation instead of a self-join: the banding relation is
    // expensive to produce, and a join would compute it twice. Buckets are
    // materialized as bounded id-lists (≤ maxBucketSize — an over-full
    // bucket is a non-discriminative hash collision *and* a shuffle-skew
    // hazard at corpus scale, so it is dropped, standard LSH hygiene),
    // then in-bucket pairs are exploded locally.
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
    val candidates = buckets
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct()

    val toks = docs.select(col(id).as("doc_id"),
      array_distinct(TextAnalysis.tokens(col(text))).as("toks"))

    candidates
      .join(toks.select(col("doc_id").as("a_id"), col("toks").as("a_toks")), Seq("a_id"))
      .join(toks.select(col("doc_id").as("b_id"), col("toks").as("b_toks")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_toks"), col("b_toks")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signatures compared by Hamming distance.
    * Signature via [[graft.functions.simhash64]]; candidates from matching
    * 16-bit chunks (any doc pair within Hamming distance 3 shares at least
    * one of 4 chunks — pigeonhole).
    */
  def simhashPairs(docs: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    import graft.functions.{simhash64, popcount64}
    val sigs = docs.select(col(id).as("doc_id"),
      simhash64(TextAnalysis.tokens(col(text))).as("sig"))
    // chunk shift amounts unrolled Scala-side: shiftright needs an Int literal
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).cast("long").bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "key")
    val l = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val r = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        popcount64(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup: pairs above a cosine threshold. Candidates
    * via sign-LSH ([[Similarity.hyperplaneBucket]]) then exact-verified.
    * `dims` is the embedding width (the plane matrix is built per width).
    */
  def embeddingNearDup(emb: DataFrame, id: String, vec: String,
                       threshold: Double, planes: Int = 16,
                       dims: Int = 64): DataFrame = {
    val withBucket = emb.select(col(id).as("vec_id"), col(vec).as("v"),
      Similarity.hyperplaneBucket(col(vec), planes, dims).as("bucket"))
    val l = withBucket.select(col("bucket"), col("vec_id").as("a_id"), col("v").as("a_v"))
    val r = withBucket.select(col("bucket"), col("vec_id").as("b_id"), col("v").as("b_v"))
    l.join(r, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Similarity.cosineF(col("a_v"), col("b_v")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
