package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LangIdModel, TextAnalysis}
import graft.sources.Tables

class LangIdModelSpec extends AnyFunSuite {
  import TestSession._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val model = LangIdModel.train(docs)

  test("training is deterministic to the bit") {
    val m2 = LangIdModel.train(docs)
    assert(model.langs == m2.langs &&
      model.weights.zip(m2.weights).forall { case (a, b) => a.sameElements(b) } &&
      model.biases.sameElements(m2.biases),
      "same data + seed must reproduce identical per-class weights (the " +
        "trained-literal oracle depends on it)")
  }

  test("class order is the heuristic's: marker langs alphabetical, 'und' last") {
    assert(model.langs == TextAnalysis.langMarkers.map(_._1) :+ "und")
  }

  test("the model learned the language axis (beats chance against the heuristic)") {
    // weak labels come from the stopword-profile heuristic; the trained
    // one-vs-rest model should reproduce its verdict well above chance
    // on the full corpus (not a tautology: the model sees only 64
    // hashed buckets, not the marker lists)
    val heur = TextAnalysis.langId(docs).select(col("doc_id"),
      col("lang_pred"))
    val pred = LangIdModel.score(docs, model).select(col("doc_id"),
      col("lang_model"))
    val joined = heur.join(pred, "doc_id")
    val n = joined.count().toDouble
    val agree = joined.filter(col("lang_pred") === col("lang_model"))
      .count().toDouble
    // chance for the dominant class is its base rate; the corpus's top
    // heuristic class is well under 70%
    assert(agree / n > 0.7, s"agreement with the weak-label source: " +
      f"${agree / n}%.3f over ${n.toInt} docs")
  }

  test("argmax tie rule: equal scores pick the alphabetically-first class") {
    // force exact ties by scoring with an all-zero model: every class
    // score is its bias; set all biases equal so every row ties
    val zero = LangIdModel.Model(model.langs,
      Array.fill(model.langs.length)(new Array[Double](64)),
      new Array[Double](model.langs.length))
    val out = LangIdModel.score(docs.limit(5), zero).collect()
    assert(out.forall(_.getAs[String]("lang_model") == model.langs.head),
      "an all-tie row must resolve to the first class in order")
  }

  test("scoring is scan-local: no join, no aggregate in the plan") {
    val plan = LangIdModel.score(docs, model).queryExecution.optimizedPlan
    val nodes = plan.collect { case n => n.nodeName }.toSet
    assert(!nodes.exists(n => n.contains("Join") || n.contains("Aggregate")),
      s"scoring must stay a scan-local projection: $nodes")
  }

  test("degenerate corpora: empty input refuses; single doc trains and scores") {
    val sp = spark
    import sp.implicits._
    intercept[IllegalArgumentException] {
      LangIdModel.train(docs.filter(lit(false)))
    }
    val one = Seq((1L, "the cat sat on the mat and that is that"))
      .toDF("doc_id", "text")
    val m = LangIdModel.train(one)
    val out = LangIdModel.score(one, m).collect()
    assert(out.length == 1 && out(0).getAs[String]("lang_model") == "en",
      s"a single clearly-English doc must score en: ${out.mkString}")
  }
}
