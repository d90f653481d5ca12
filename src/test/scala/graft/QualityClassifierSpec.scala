package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, TextAnalysis}
import graft.sources.Tables

class QualityClassifierSpec extends AnyFunSuite {
  import TestSession._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val model = QualityClassifier.train(docs)

  test("training is deterministic to the bit") {
    val m2 = QualityClassifier.train(docs)
    assert(model.weights.sameElements(m2.weights) && model.bias == m2.bias,
      "same data + seed must reproduce identical weights (the trained-literal " +
        "oracle depends on it)")
  }

  test("the model learned the quality axis (beats chance against the rule verdict)") {
    // the weak labels derive from rule∧LM agreement, so the trained
    // model should reproduce the RULE verdict well above chance on the
    // full corpus (not a tautology: the model sees only 64 hashed
    // token buckets, never the rule features themselves)
    val joined = QualityClassifier.score(docs, model)
      .join(docs.select(col("doc_id"),
        TextAnalysis.qualityKeepExpr().cast("long").as("rule_keep")), "doc_id")
    val (agree, total) = {
      val r = joined.agg(
        sum((col("keep_pred") === col("rule_keep")).cast("long")),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val baseRate = {
      val r = joined.agg(avg(col("rule_keep").cast("double"))).head().getDouble(0)
      math.max(r, 1 - r) // majority-class accuracy
    }
    val acc = agree.toDouble / total
    assert(acc > math.max(0.6, baseRate - 0.05),
      s"classifier accuracy vs rule verdict $acc (majority baseline $baseRate) — " +
        "the model learned nothing")
  }

  test("keepExpr agrees with score's keep_pred row for row") {
    val viaExpr = docs.filter(QualityClassifier.keepExpr(model))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaScore = QualityClassifier.score(docs, model)
      .filter(col("keep_pred") === 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExpr == viaScore)
  }

  test("scoring is scan-local: no join, no aggregate, no width-changing exchange") {
    // the weights ride inside the LogitDot expression, so inference
    // must be a pure projection over the scan — the only allowed
    // exchange is the presentation sort's range partitioning
    val plan = QualityClassifier.score(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring plan contains a join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"scoring plan aggregates:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"scoring plan has $exchanges exchanges (only the presentation sort is allowed):\n$plan")
  }

  test("degenerate corpora: empty input refuses; single doc trains and scores") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](QualityClassifier.train(empty))
    val one = Seq((1L, "the cat sat on the mat and looked at the door")).toDF("doc_id", "text")
    val m = QualityClassifier.train(one)
    val out = QualityClassifier.score(one, m).collect()
    assert(out.length == 1 && !out(0).isNullAt(1))
  }

  test("curation pipeline: the classifier stage gates docs and emits its manifest row") {
    val plan = GraftApi.curatePlan(docs, qualityModel = Some(model))
    try {
      val m = plan.manifest.collect().map(r =>
        (r.getAs[String]("stage"), r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out")))
      val stages = m.map(_._1).toSeq
      assert(stages.contains("quality_classifier"),
        s"no quality_classifier manifest row in $stages")
      val row = m.find(_._1 == "quality_classifier").get
      // the stage follows the rule filter: it can only drop further
      assert(row._3 <= row._2)
      val qf = m.find(_._1 == "quality_filter").get
      assert(row._2 == qf._3, "classifier stage must consume the rule filter's survivors")
    } finally plan.release()
  }
}
