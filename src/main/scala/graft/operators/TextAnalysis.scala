package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text analysis + exact dedup over the documents corpus — the
  * LLM-training-data operator set (SURVEY.md §2H): normalization,
  * exact dedup, token counting, quality scoring, language-ID
  * heuristic, content fingerprinting.
  *
  * All operators are per-row Column expressions (whole-stage codegen);
  * dedup is one hash shuffle on the content hash. At 100 TB the
  * content-hash groupBy distributes uniformly by construction (hashes
  * are uniform) and carries only (hash, doc_id) pairs, not the text.
  */
object TextAnalysis {

  /** Canonical text form: lowercase, trimmed, whitespace collapsed. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Exact dedup (normalized-content hash, keep lowest doc_id):
    * one row per distinct content with its representative and
    * multiplicity. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(normalize(col("text")).cast("binary")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  /** Token counting: whitespace tokens and a BPE-ish lexer count
    * (letter runs | digit runs | single non-alnum symbol). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(normalize(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  private val stopwords = Seq("the", "a", "of", "and", "is", "in", "to")

  /** Quality scoring: length, token stats, stopword/punctuation/
    * uppercase ratios, and a composite score in [0,1]
    * (data-quality gate for corpus filtering). */
  def textQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    // greatest(…,1) guards empty text: Spark's non-ANSI x/0 is NULL but
    // DuckDB's is NaN — the guard makes both engines emit 0 ratios
    val nChars = greatest(length(col("text")).cast("double"), lit(1.0))
    val nStop = GraftFunctions.countInSet(toks, stopwords).cast("double")
    val nPunct = regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("double")
    val nUpper = regexp_count(col("text"), lit("[A-Z]")).cast("double")
    val stopRatio = nStop / greatest(nTok, lit(1.0))
    val punctRatio = nPunct / nChars
    val upperRatio = nUpper / nChars
    val score = least(nTok / 200d, lit(1.0)) * 0.5 +
      stopRatio * 0.25 + (lit(1.0) - punctRatio) * 0.25
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      nTok.cast("long").as("n_tokens"),
      rnd(stopRatio, 4).as("stopword_ratio"),
      rnd(punctRatio, 4).as("punct_ratio"),
      rnd(upperRatio, 4).as("upper_ratio"),
      rnd(score, 4).as("quality_score"))
      .orderBy("doc_id")
  }

  /** The composite quality score of [[textQuality]] as a standalone
    * Column (rounded 4dp — the deterministic ranking key for
    * quality-aware dedup). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = greatest(length(text).cast("double"), lit(1.0))
    val nStop = GraftFunctions.countInSet(toks, stopwords).cast("double")
    val nPunct = regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("double")
    rnd(least(nTok / 200d, lit(1.0)) * 0.5 +
      (nStop / greatest(nTok, lit(1.0))) * 0.25 +
      (lit(1.0) - nPunct / nChars) * 0.25, 4)
  }

  /** Quality-aware exact dedup: of each group of content-identical
    * documents, KEEP THE HIGHEST-QUALITY COPY (modern corpus-dedup
    * practice — duplicates share normalized content but differ in raw
    * casing/whitespace, so their quality scores differ), ties to the
    * lowest doc_id. The ranking window and the multiplicity count
    * share the content-hash partitioning — one shuffle, like
    * [[dedupExact]]. */
  def dedupKeepBest(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
    docs
      .select(col("doc_id"),
        md5(normalize(col("text")).cast("binary")).as("content_hash"),
        qualityScore(col("text")).as("quality_score"))
      .select(col("doc_id"), col("content_hash"), col("quality_score"),
        row_number().over(w.orderBy(desc("quality_score"), asc("doc_id"))).as("rn"),
        count(lit(1)).over(w).as("n_copies"))
      .filter(col("rn") === 1)
      .select(col("content_hash"), col("doc_id").as("keep_id"),
        col("quality_score").as("best_quality"), col("n_copies"))
      .orderBy("keep_id")
  }

  /** Language-marker word lists (alphabetical by lang code); the
    * stopword-profile heuristic scores each language by marker-token
    * frequency and picks the argmax (ties → first alphabetically,
    * all-zero → 'und'). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "ein", "nicht"),
    "en" -> Seq("the", "of", "and", "is", "to", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"))

  def langId(docs: DataFrame): DataFrame = {
    val scored = langMarkers.foldLeft(docs.withColumn("toks", tokens(col("text")))) {
      case (df, (lang, words)) =>
        df.withColumn(s"s_$lang",
          GraftFunctions.countInSet(col("toks"), words).cast("long"))
    }
    val langs = langMarkers.map(_._1)
    val allZero = langs.map(l => col(s"s_$l") === 0).reduce(_ && _)
    // argmax with ties to the alphabetically-first language
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), elseCol) =>
      val beatsLater = langs.drop(i + 1).map(m => col(s"s_$l") >= col(s"s_$m"))
        .foldLeft(lit(true))(_ && _)
      when(beatsLater, lit(l)).otherwise(elseCol)
    }
    scored.select(
      Seq(col("doc_id")) ++ langs.map(l => col(s"s_$l")) :+
        when(allZero, "und").otherwise(pred).as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  /** Sequence packing (training-batch assembly): documents concatenate
    * in (source, doc_id) order and split into fixed token-budget
    * training sequences — the GPT-style "concatenate and chunk"
    * regime. A document's pack is where its first token lands
    * (`cum_before div budget`), so assignment is a pure function of
    * the per-source exclusive running token count: ONE window cumsum
    * per source partition, the same single-shuffle entity-window shape
    * as the time-series features. At 100 TB, `source` shards the
    * corpus (packing order within a shard is what training needs —
    * there is no global order to maintain). */
  def packSequences(docs: DataFrame, budget: Long = 2048L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div ${budget}L").as("pack_id"),
        expr(s"cum_before % ${budget}L").as("start_offset"))
      .orderBy("source", "doc_id")
  }

  /** Content fingerprint: 64-bit polynomial rolling hash of the
    * normalized text via the custom codegen'd Catalyst expression. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      GraftFunctions.fingerprint64(normalize(col("text"))).as("fp64"))
      .orderBy("doc_id")
}
