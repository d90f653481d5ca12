package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Continuous corpus construction — the streaming form of
  * [[graft.operators.TextAnalysis.dedupIncremental]]: documents arrive
  * as a stream, each micro-batch is deduplicated WITHIN itself
  * (keep-lowest-id per content) and AGAINST everything admitted by
  * earlier batches, and the survivors append to the corpus lake.
  *
  * Exactly-once contract (the [[EventsStream.resilientBatch]] layout):
  * batch N writes BOTH its corpus rows and its admitted content hashes
  * under `batch_id=N` partitions with mode-overwrite, so a redelivered
  * batch replaces its own prior attempt instead of double-admitting —
  * and the cross-batch membership check reads every hash partition
  * EXCEPT its own, so its prior attempt can never block its retry.
  *
  * Scale shape: the membership anti-join touches content hashes only
  * (32 hex chars + id per admitted doc), never corpus text; the
  * within-batch rank windows on the batch side alone. At 100 TB of
  * ACCUMULATED corpus the hash store is the bucketed table of
  * [[graft.operators.TextAnalysis.dedupIncrementalPrehashed]] (the
  * anti-join then shuffles only the arriving batch); the plain
  * partitioned-parquet store here keeps the streaming semantics
  * testable without catalog state. */
object CorpusIngest {

  /** One micro-batch: admit new content, idempotently. Exposed for
    * direct redelivery testing. */
  def ingestBatch(batch: Dataset[Row], batchId: Long,
                  corpusDir: String, hashDir: String): Unit = {
    val spark = batch.sparkSession
    val hashed = batch.select(
      col("doc_id"), col("source"), col("text"),
      TextAnalysis.contentHash(col("text")).as("content_hash"))
    // hashes admitted by OTHER batches (own prior attempt excluded —
    // a redelivery must be able to re-admit what it admitted before).
    // The first-batch case is an EXPLICIT existence check, not a
    // swallowed read exception: treating any AnalysisException as
    // "first batch" would fail OPEN — a deleted/misconfigured hash
    // store would silently disable cross-batch dedup forever. Here a
    // missing store admits everything ONCE (genuinely first batch);
    // any other read failure propagates, fails the batch, and the
    // stream retries it.
    val hashPath = new org.apache.hadoop.fs.Path(hashDir)
    val fs = hashPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val storeExists = fs.exists(hashPath) &&
      fs.listStatus(hashPath).exists(_.getPath.getName.startsWith("batch_id="))
    val prior =
      if (storeExists)
        spark.read.parquet(hashDir)
          .filter(col("batch_id") =!= batchId).select("content_hash")
      else hashed.select("content_hash").where(lit(false))
    val w = Window.partitionBy("content_hash").orderBy("doc_id")
    val survivors = hashed
      .join(prior, Seq("content_hash"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .persist()
    try {
      // hash partition FIRST: the two writes are not atomic, and the
      // failure window between them must err toward over-blocking, not
      // double-admission. Hashes-without-rows is safe — a retry of the
      // SAME batch id excludes its own partition (and overwrites both),
      // and the engine redelivers an uncommitted batch under the same
      // id from the checkpoint. Rows-without-hashes (the old order)
      // would let a permanently abandoned stream re-admit the same
      // content under a fresh batch id on a later restart.
      survivors.select("content_hash")
        .write.mode("overwrite").parquet(s"$hashDir/batch_id=$batchId")
      survivors.drop("content_hash")
        .write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
    } finally { survivors.unpersist(); () }
  }

  /** The streaming sink: `docs` must carry (doc_id, source, text). */
  def sink(docs: DataFrame, corpusDir: String, hashDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      ingestBatch(batch, batchId, corpusDir, hashDir)
    }
}
