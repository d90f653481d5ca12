package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** cid + centroid array + its norm as a broadcastable frame. */
  private def centroidDF(spark: SparkSession, cents: Seq[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cid", "c").withColumn("cnrm", sqrt(dot(col("c"), col("c"))))
  }

  /** Nearest-centroid assignment. The cross join against the broadcast
    * centroid frame expands map-side only: partial max_by collapses the
    * nList copies of each row back to one before the exchange, so the
    * shuffle carries n rows (vec_id, cid, v, nrm) — one shuffle per
    * Lloyd iteration regardless of nList. */
  private def assignAll(e: DataFrame, cdf: DataFrame): DataFrame =
    e.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        (dot(col("v"), col("c")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))

  /** IVF ANN (the k-means counterpart to annLsh's hyperplane buckets):
    * a spherical k-means coarse quantizer of nList centroids is trained
    * distributed (assignment + per-dimension mean are DataFrame aggs;
    * only the nList×dim centroid matrix — KBs by design — ever lands on
    * the driver, the standard IVF shape). Each vector then belongs to
    * one inverted list; a query scores only the vectors in its nProbe
    * closest lists. The candidate join hash-partitions on the list id,
    * so at 100 TB each list is a co-located slice and the pair space is
    * ~nProbe/nList of brute force; train the quantizer on a sample
    * there rather than the full corpus. Deterministic end-to-end:
    * seeded xxhash64 init, cosine ties broken by lowest cid. */
  def annIvf(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5,
             nList: Int = 16, nProbe: Int = 4, iters: Int = 3,
             seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    val e = withNorm(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // init: nList seeded-hash-selected corpus vectors, unit direction
    var cents: Seq[(Int, Array[Float])] = e.select(col("vec_id"), col("v"))
      .withColumn("h", xxhash64(col("vec_id"), lit(seed)))
      .orderBy("h", "vec_id").limit(nList).collect().toSeq
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
    val dim = cents.head._2.length

    for (_ <- 1 to iters) {
      // spherical update: mean of member unit vectors, renormalized
      val sums = assignAll(e, centroidDF(spark, cents))
        .select(col("cid"), col("nrm"), posexplode(col("v")))
        .groupBy("cid", "pos").agg(sum(col("col") / col("nrm")).as("s"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case None => (cid, old) // empty list keeps its centroid
          case Some(rows) =>
            val v = new Array[Double](dim)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(v.map(x => x * x).sum)
            (cid, if (n == 0.0) old else v.map(x => (x / n).toFloat))
        }
      }
    }

    val cdf = centroidDF(spark, cents)
    val assigned = assignAll(e, cdf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // nProbe nearest lists per query vector (the query's own assigned
    // list is irrelevant here — probing picks its lists fresh)
    val q = assigned.filter(col("vec_id") < nQueries).drop("cid")
    val pw = Window.partitionBy("query_id").orderBy(desc("ccos"), asc("cid"))
    val probed = q.crossJoin(broadcast(cdf))
      .select(col("vec_id").as("query_id"), col("cid"),
        (dot(col("v"), col("c")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select("query_id", "cid")

    // exact cosine over the probed inverted lists only
    val cand = q.as("a")
      .join(broadcast(probed.as("p")), col("a.vec_id") === col("p.query_id"))
      .join(assigned.as("b"),
        col("p.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        round(cosine + lit(1e-9), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
