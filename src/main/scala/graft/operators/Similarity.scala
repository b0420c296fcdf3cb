package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — embarrassingly parallel, no shuffle of the corpus).
  * Scale path: IVF — partition the corpus by nearest centroid so a query
  * probes only `nprobe` cells, and sign-LSH bucketing for near-dup joins.
  */
object Similarity {

  /** Dot product in double precision (left-to-right fold — the same
    * accumulation order every engine's sequential loop uses).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** cosine(a,b) = dot/(sqrt(|a|²·|b|²)); 0 for a zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(norm2(a) * norm2(b))
    when(denom === 0d, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Brute-force exact top-k neighbours for each query vector.
    * Ranking key is the cosine rounded to 6 decimals with the corpus id as
    * tiebreak, so the result set is deterministic across engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(id).as("query_id"), col(vec).as("q_vec"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 scaled to [-1, 1). No RNG state — reproducible on any engine
    * and any partitioning.
    */
  private def planeComponent(plane: Column, d: Column): Column =
    (xxhash64(plane, d).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-LSH: `planes`-bit bucket id from the signs of dot(v, rand_plane). */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0d, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(planes - 1)), (bit, p) => bit * pow(lit(2.0), p).cast("long")),
      lit(0L), (acc, x) => acc + x)
  }

  /** IVF index: assign every corpus vector to its nearest centroid cell.
    * Deterministic seeding: the first `cells` vectors (by id) are the
    * centroids — no RNG, reproducible. Returns corpus + `cell` column.
    * On a real cluster, write this partitioned/bucketed by `cell` so a
    * query reads only its probed cells (partition pruning).
    */
  def ivfAssign(corpus: DataFrame, id: String, vec: String, cells: Int): DataFrame = {
    val centroids = corpus.orderBy(col(id)).limit(cells)
      .select(col(id).as("cell"), col(vec).as("centroid"))
    val scored = corpus.select(col(id), col(vec))
      .join(broadcast(centroids))
      .select(col(id), col(vec), col("cell"), cosine(col(vec), col("centroid")).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id)).orderBy(col("sim").desc, col("cell").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(id), col(vec), col("cell"))
  }

  /** IVF search: probe the `nprobe` nearest cells per query, exact top-k
    * within the probed subset. Trades recall for a ~cells/nprobe scan cut.
    */
  def ivfSearch(indexed: DataFrame, queries: DataFrame, id: String, vec: String,
                cells: Int, nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = indexed.filter(col("cell") === col(id))
      .select(col("cell"), col(vec).as("centroid"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("q_vec"))
    val probes = q.join(broadcast(centroids))
      .select(col("query_id"), col("q_vec"), col("cell"),
        cosine(col("q_vec"), col("centroid")).as("sim"))
    val wq = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cell").asc)
    val probed = probes.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe).select("query_id", "q_vec", "cell")

    val scored = indexed.select(col("cell"), col(id).as("neighbor_id"), col(vec).as("c_vec"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
