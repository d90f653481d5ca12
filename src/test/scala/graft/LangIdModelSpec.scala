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

  test("char-gram basis separates no-space scripts the word basis collapses (r19)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def sent(words: Seq[String], n: Int): String =
      Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
    val en = Seq("the", "of", "and", "is", "to", "that", "house", "water", "light")
    val de = Seq("der", "die", "und", "ist", "ein", "nicht", "haus", "wasser", "licht")
    val th = Seq(
      "สวัสดีครับวันนี้อากาศดีมาก",
      "ประเทศไทยมีอาหารอร่อยมากมาย",
      "ภาษาไทยไม่มีการเว้นวรรคระหว่างคำ",
      "การเรียนรู้ของเครื่องเป็นสาขาหนึ่งของปัญญาประดิษฐ์",
      "แม่น้ำเจ้าพระยาไหลผ่านกรุงเทพมหานคร")
    val rows = (0 until 60).map(i => (i.toLong, sent(en, 8))) ++
      (60 until 120).map(i => (i.toLong, sent(de, 8))) ++
      (120 until 180).map(i => (i.toLong, th(i % th.length) * (1 + i % 3)))
    val corpus = rows.toDF("doc_id", "text")
    // the word-token failure mode, made visible: a no-space line is ONE
    // whitespace token, so its word embedding is one-hot — every Thai
    // line looks like "some single feature" to the r18 basis (and to
    // its weak-label teacher); char windows see the script itself
    val emb = corpus.filter(col("doc_id") >= 120).select(
        LangIdModel.featEmbed(col("text"), 64, charGrams = false).as("w"),
        LangIdModel.featEmbed(col("text"), 64, charGrams = true).as("c"))
      .collect()
    assert(emb.forall(_.getSeq[Float](0).count(_ != 0f) == 1),
      "a no-space line must collapse to a one-hot word-token embedding")
    assert(emb.forall(_.getSeq[Float](1).count(_ != 0f) > 8),
      "char windows must spread a no-space line across many features")
    // the char-basis model separates HELD-OUT docs: marker languages
    // classify as themselves, a new Thai sentence as the non-marker
    // class — the fastText-faithful axis the verdict asked for
    val m = LangIdModel.train(corpus, charGrams = true)
    val held = Seq(
      (1000L, sent(en, 10)), (1001L, sent(de, 10)),
      (1002L, "ปัญญาประดิษฐ์ช่วยให้คอมพิวเตอร์เข้าใจภาษามนุษย์"))
      .toDF("doc_id", "text")
    val out = LangIdModel.score(held, m, charGrams = true).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_model")).toMap
    assert(out(1000L) == "en" && out(1001L) == "de",
      s"marker-language held-outs misclassified: $out")
    assert(out(1002L) == "und",
      s"no-space-script held-out not separated from the marker languages: $out")
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
