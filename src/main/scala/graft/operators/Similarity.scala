package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over the embeddings table (SURVEY.md §2H):
  * embedding-cosine near-dup pairs, brute-force cosine top-k, and the
  * LSH-bucketed ANN scale path.
  *
  * Numeric discipline: floats are cast to double BEFORE any multiply,
  * and all sums run left-to-right over the array — the DuckDB oracle
  * mirrors the exact same expression shape so both engines produce
  * bit-identical doubles.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float arrays —
    * the codegen'd DotFD expression (the zip_with/aggregate HOF chain
    * is CodegenFallback and ~10x slower on the hot path). */
  private def dot(a: Column, b: Column): Column = GraftFunctions.dotFD(a, b)

  /** vec_id + embedding + its L2 norm (double). */
  def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  private def cosine: Column =
    dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))

  /** Embedding-cosine near-dup pairs: all (i<j) pairs with
    * cosine >= tau. Locally a broadcast nested-loop block join; at
    * scale the candidate space would be bucket-restricted first (see
    * annLsh) — this operator is the exact reference semantics. */
  def embedDedup(embeddings: DataFrame, tau: Double = 0.4): DataFrame = {
    val e = withNorm(embeddings)
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine + lit(1e-9), 6).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy("vec_a", "vec_b")
  }

  /** Brute-force cosine top-k: for each query vector (vec_id <
    * nQueries), the k nearest other vectors by rounded cosine,
    * tie-broken by candidate id — deterministic across engines. */
  def annTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
    val scored = q.as("a").join(broadcast(e.as("b")), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        round(cosine + lit(1e-9), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN (the 100 TB path): multi-table random-hyperplane
    * LSH — `tables` independent seeded signatures of `nPlanes` bits
    * each; a candidate is any vector sharing ANY table's bucket with
    * the query. Candidates are deduped, then exact-cosine top-k runs
    * over that restricted set only. The bucket join is one hash
    * shuffle on (table, bucket); per-bucket lists are ~n/2^nPlanes of
    * the corpus, and recall grows with `tables` (tested against
    * annTopK in SimilaritySpec). */
  def annLsh(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5,
             nPlanes: Int = 6, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val e = embeddings
      .select(Seq(col("vec_id"), col("embedding")) ++
        (0 until tables).map(t =>
          GraftFunctions.rhpSig(col("embedding"), nPlanes, seed + t).as(s"b$t")): _*)
      .select(col("vec_id"), col("embedding").as("v"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.filter(col("vec_id") < nQueries)
    val cand = q.as("a")
      .join(e.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        round(cosine + lit(1e-9), 6).as("cos"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
