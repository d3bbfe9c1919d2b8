package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(FloatType)) — north-star extension (BASELINE.json).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k, query set × corpus. The
  *    correctness baseline; at scale it only survives when the query
  *    side is small enough to broadcast (it is here by construction).
  *  - [[lshTopK]]: hyperplane-LSH bucketing (deterministic integer
  *    hyperplanes, see [[lshBucket]]) restricts candidates to the
  *    query's bucket — the 100 TB path: one shuffle on the bucket id,
  *    per-bucket candidate lists ~corpus/2^planes. Recall is tunable
  *    via `planes` (fewer planes = bigger buckets = higher recall);
  *    multi-probe (flipping low-margin bits) is the standard extension
  *    and documented here rather than built, since the test corpus
  *    needs none.
  *
  * All vector math stays inside Spark SQL lambda expressions
  * (`transform`/`aggregate`/`zip_with`) so whole-stage codegen applies
  * and an oracle can reproduce values bit-for-bit: elements are cast
  * to double first, dot products fold left-to-right, and ranking keys
  * quantize to floor(cos*10000) with vec_id tiebreaks.
  */
object Similarity {

  /** Sequential left-to-right dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic hyperplane-LSH bucket id in [0, 2^planes).
    *
    * Hyperplane p's coefficient for dimension d is the integer
    * `((1103515245*(p*dim+d) + 12345) mod 2^31) mod 7 - 3` — an LCG
    * step reduced to [-3,3], reproducible in any engine with 64-bit
    * integer arithmetic (no RNG state, no floats until the projection
    * itself). Bit p of the bucket = sign of the projection onto plane p.
    */
  def lshBucket(v: Column, planes: Int, dim: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(
          transform(sequence(lit(1), lit(dim)),
            d => (((lit(1103515245L) * (p.cast("long") * dim + (d - 1)) + 12345L)
              % 2147483648L) % 7 - 3).cast("double")),
          v, (c, x) => c * x),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ranked by (cos desc, id asc). The query
    * side is broadcast — corpus never shuffles.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_q", floor(cosine(col("qv"), col("cv")) * 10000).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_q")
  }

  /** LSH-bucketed ANN top-k: candidates are bucket-mates only. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 8, dim: Int = 64,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, dim))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_q", floor(cosine(col("qv"), col("cv")) * 10000).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_q")
  }
}
