package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Model-BASED language identification — the fastText-class axis the
  * stopword-profile heuristic ([[TextAnalysis.langId]]) approximates:
  * real pipelines gate on a TRAINED lang-ID model (fastText in
  * CCNet/RedPajama/FineWeb), because marker lists miss short
  * documents, code-mixed text, and any token the list author didn't
  * enumerate. This mirrors [[QualityClassifier]]'s shape exactly, one
  * rung up in class count (reference analog: the rain classifier's
  * train/score shape, weather_predictor.py:313-391, applied per
  * language):
  *
  *  1. WEAK LABELS from the heuristic — [[TextAnalysis.langId]]'s
  *     stopword-profile argmax labels a seeded bounded sample (the
  *     standard weak-supervision bootstrap: the cheap rule teaches the
  *     generalizing model; fastText itself trains on
  *     Wikipedia-provenance labels, the same move one level up).
  *  2. TRAIN one-vs-rest logistic regressions over hashing-trick
  *     embeddings — one binary model per label class, each trained by
  *     the same seeded full-batch GD as the quality classifier
  *     (deterministic to the bit; driver state = |langs|·(dim+1)
  *     doubles).
  *  3. SCORE scan-locally: one [[graft.functions.HashEmbed]] per row,
  *     one [[graft.functions.LogitDot]] per class against it, argmax
  *     with ties to the alphabetically-first class (the heuristic's
  *     tie rule). No join, no shuffle — 100 TB embarrassingly
  *     parallel.
  *
  * Cross-engine contract (trained-literal oracle): the per-class
  * scores round to 6dp BEFORE the argmax, so engines whose dot
  * products agree bitwise (widened left-to-right — they do) rank
  * classes identically; DuckDB re-derives the embedding via the
  * hashEmbedCte chain and the argmax over the exported weight/bias
  * literals. The heuristic form is retained as the label source and
  * the SQL-oracled q_lang_id entry. */
object LangIdModel {

  /** One-vs-rest trained model: `langs` in the fixed (alphabetical +
    * "und"-last) class order, one weight vector + bias per class. */
  final case class Model(langs: Seq[String], weights: Array[Array[Double]],
                         biases: Array[Double])

  /** The class universe: the heuristic's marker languages plus its
    * all-zero fallback class. */
  val classes: Seq[String] = TextAnalysis.langMarkers.map(_._1) :+ "und"

  /** The feature embedding, selected by basis (r19): word tokens (the
    * r18 form) or char 3..5-grams over the normalized text —
    * fastText's actual basis, and the one that matters for no-space
    * scripts: a Thai/CJK line is ONE whitespace token, so the word
    * embedding collapses to a single hash bucket per line (every such
    * line looks alike), while char windows see the script itself.
    * Both are scan-local codegen'd projections. */
  private[graft] def featEmbed(text: Column, dim: Int,
                               charGrams: Boolean): Column =
    if (charGrams)
      GraftFunctions.hashEmbed(
        GraftFunctions.charNgrams(GraftFunctions.normalizeWs(text), 3, 5), dim)
    else GraftFunctions.hashEmbed(TextAnalysis.tokens(text), dim)

  /** Deterministic weak-label training frame: (embedding, class index)
    * for a seeded hash-ordered sample. One Spark action. */
  private def trainingSample(docs: DataFrame, dim: Int, sampleN: Int,
                             seed: Long, charGrams: Boolean): Array[(Array[Float], Int)] = {
    val emb = docs.select(col("doc_id"),
      featEmbed(col("text"), dim, charGrams).as("embedding"))
    val labels = TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred"))
    emb.join(labels, "doc_id")
      .withColumn("h", xxhash64(col("doc_id"), lit(seed)))
      .orderBy("h", "doc_id").limit(sampleN)
      .select(col("embedding"), col("lang_pred"))
      .collect()
      .map { r =>
        // a weak label outside the class universe means langMarkers /
        // langId drifted — fail loudly rather than silently relabel
        // the row as class 0 (r18 advice)
        val idx = classes.indexOf(r.getString(1))
        require(idx >= 0,
          s"unknown weak label '${r.getString(1)}' — " +
            "TextAnalysis.langId's output domain drifted from LangIdModel.classes")
        (r.getSeq[Float](0).toArray, idx)
      }
  }

  /** Train the one-vs-rest model on heuristic weak labels — the
    * [[QualityClassifier.train]] GD loop run once per class with
    * y = (label == class). Deterministic: seeded hash-ordered sample,
    * fixed step and iteration count. A class absent from the sample
    * still trains (its GD drives the bias negative and stays bounded
    * under the fixed iteration budget) — scoring then just never
    * picks it. */
  def train(docs: DataFrame, dim: Int = 64, sampleN: Int = 8192,
            iters: Int = 200, lr: Double = 0.5,
            seed: Long = 42L, charGrams: Boolean = false): Model = {
    val sample = trainingSample(docs, dim, sampleN, seed, charGrams)
    require(sample.nonEmpty,
      "LangIdModel.train: documents input is empty — nothing to train on")
    val d = sample.head._1.length
    val n = sample.length
    val ws = Array.ofDim[Double](classes.length, d)
    val bs = new Array[Double](classes.length)
    var c = 0
    while (c < classes.length) {
      val w = ws(c)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val gw = new Array[Double](d)
        var gb = 0.0
        var r = 0
        while (r < n) {
          val (v, yi) = sample(r)
          val y = if (yi == c) 1.0 else 0.0
          var z = b
          var i = 0
          while (i < d) { z += v(i).toDouble * w(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val g = p - y
          i = 0
          while (i < d) { gw(i) += g * v(i).toDouble; i += 1 }
          gb += g
          r += 1
        }
        var i = 0
        while (i < d) { w(i) -= lr * gw(i) / n; i += 1 }
        b -= lr * gb / n
        it += 1
      }
      bs(c) = b
      c += 1
    }
    Model(classes, ws, bs)
  }

  /** Score every document — (doc_id, s_<lang>…, lang_model): the
    * 6dp-rounded per-class linear scores and the argmax class (ties →
    * first in class order = alphabetical, "und" last — the heuristic's
    * tie discipline). Pure scan-local codegen'd projection: the
    * embedding is computed once per row as a non-cheap multi-consumer
    * alias (CollapseProject leaves it alone — the redactCountIps
    * precedent), each class score is one LogitDot against it. */
  def score(docs: DataFrame, model: Model, dim: Int = 64,
            charGrams: Boolean = false): DataFrame = {
    val scored = docs.select(col("doc_id"),
        featEmbed(col("text"), dim, charGrams).as("emb"))
      .select(Seq(col("doc_id")) ++ model.langs.zipWithIndex.map {
        case (l, i) => rnd(GraftFunctions.logitDot(col("emb"), model.weights(i))
          + lit(model.biases(i)), 6).as(s"s_$l")
      }: _*)
    val pred = model.langs.zipWithIndex.foldRight(lit(model.langs.last): Column) {
      case ((l, i), elseCol) =>
        val beatsLater = model.langs.drop(i + 1)
          .map(m => col(s"s_$l") >= col(s"s_$m"))
          .foldLeft(lit(true))(_ && _)
        when(beatsLater, lit(l)).otherwise(elseCol)
    }
    scored.select(
      Seq(col("doc_id")) ++ model.langs.map(l => col(s"s_$l")) :+
        pred.as("lang_model"): _*)
      .orderBy("doc_id")
  }

  /** Train + score in one call (the q_lang_id_model query body),
    * memoized like [[QualityClassifier.trainedModel]]. The memo key
    * (r19, closing the r18 advice): (session, dir, dim, the TRAIN
    * hyperparameters, and the analyzed plan's semanticHash of `docs`)
    * — a filtered slice, a rewritten table under the same dir, or a
    * different training configuration now trains its own model
    * instead of silently scoring against the first call's. */
  def classify(spark: SparkSession, docs: DataFrame, dir: String,
               dim: Int = 64, charGrams: Boolean = false): DataFrame =
    score(docs, trainedModel(spark, docs, dir, dim, charGrams), dim, charGrams)

  /** Default train hyperparameters, part of the memo key so a
    * non-default [[train]] call can never be confused with the
    * memoized default-trained model. */
  private val defaultHyper = (8192, 200, 0.5, 42L)

  /** Both feature bases run in one Verify/test JVM, so the memo is a
    * small map (word + char per corpus), not a single slot — but
    * BOUNDED (r19 advice): sessions are WEAK outer keys so a stopped
    * session's models unpin with it, and each session's inner map
    * clears past [[MemoCap]] so a long-lived JVM scoring many
    * distinct plan shapes re-trains (deterministic, bit-identical)
    * instead of accumulating models forever. WeakHashMap is not
    * thread-safe — outer access synchronizes on the map. */
  private val MemoCap = 32
  private val modelMemo = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[
      (String, Int, (Int, Int, Double, Long), Int, Boolean), Model]]()

  def trainedModel(spark: SparkSession, docs: DataFrame, dir: String,
                   dim: Int = 64, charGrams: Boolean = false): Model = {
    val inner = modelMemo.synchronized {
      var m = modelMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap()
        modelMemo.put(spark, m)
      }
      m
    }
    if (inner.size > MemoCap) inner.clear()
    val key = (dir, dim, defaultHyper,
      docs.queryExecution.analyzed.semanticHash(), charGrams)
    inner.computeIfAbsent(key, _ => train(docs, dim, charGrams = charGrams))
  }

  /** Test hook: drop the model memo. */
  private[graft] def invalidate(): Unit =
    modelMemo.synchronized(modelMemo.clear())
}
