package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings(vec_id,
  * embedding ARRAY<FLOAT>, label)`).
  *
  * Baseline: brute-force cosine top-k — `zip_with` dot product + `aggregate`
  * norms, all codegen'd Column expressions (no UDF). Scale path: LSH
  * bucketing by deterministic hyperplane signs — candidates only compare
  * within a bucket, turning the O(N·Q) scan into O(N/2^H·Q) with a
  * recall/speed dial (H = number of hyperplanes).
  */
object Similarity {

  /** cosine(a, b) in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k neighbours of the vector with id `queryId`.
    * One broadcast (the single query row), one scan, one TakeOrdered.
    */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** All near-duplicate pairs with cosine ≥ threshold among consecutive
    * vec_ids — the deterministic small-pair-set demonstration of
    * embedding-cosine near-dup (LSH buckets pick pairs at scale).
    */
  def cosineNearDupConsecutive(embeddings: DataFrame,
                               threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_id_a"),
      col("embedding").as("ea"))
    val b = embeddings.select((col("vec_id") - 1).as("vec_id_a"),
      col("embedding").as("eb"))
    a.join(b, "vec_id_a")
      .select(col("vec_id_a"), round(cosine(col("ea"), col("eb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic pseudo-random hyperplane component for (plane h, dim d):
    * a fixed integer hash mapped to ±1 — reproducible on any engine, no RNG.
    */
  private def planeSign(h: Column, d: Column): Column =
    ((d * 2654435761L + h * 40503L) % 97 % 2) * 2 - 1

  /** LSH bucket id: H hyperplane sign bits over the embedding. Vectors in
    * the same bucket are candidate neighbours; the scale path probes only
    * the query's bucket (and optionally neighbouring buckets for recall).
    */
  def lshBuckets(embeddings: DataFrame, numPlanes: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dims = posexplode(col("embedding"))
    val e = embeddings.select(col("vec_id"), dims.as(Seq("d", "x")))
    val planes = (0 until numPlanes).toDF("h")
    e.crossJoin(broadcast(planes))
      .withColumn("contrib",
        col("x").cast("double") * planeSign(col("h").cast("long"), col("d").cast("long")))
      .groupBy("vec_id", "h")
      .agg(sum("contrib").as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0, expr("CAST(pow(2, h) AS BIGINT)"))
        .otherwise(0L)).as("bucket"))
  }

  /** Bucketed ANN: top-k within the query vector's LSH bucket. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int,
              numPlanes: Int = 8): DataFrame = {
    val buckets = lshBuckets(embeddings, numPlanes)
    val withB = embeddings.join(buckets, "vec_id")
    val qb = withB.filter(col("vec_id") === queryId)
      .select(col("bucket").as("q_bucket"), col("embedding").as("q_embedding"))
    withB.crossJoin(broadcast(qb))
      .filter(col("bucket") === col("q_bucket") && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
