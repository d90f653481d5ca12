package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalIds
import graft.sources.Tables

class GlobalIdsSpec extends AnyFunSuite {
  import TestSession._

  private lazy val docs = Tables.documents(spark, sfDir).select("doc_id", "source")

  test("assignIds is bit-identical to the whole-dataset rank") {
    val got = GlobalIds.assignIds(docs, "doc_id")
      .select("doc_id", "global_id").orderBy("doc_id").collect()
    val want = GlobalIds.assignIdsExact(docs, "doc_id")
      .select("doc_id", "global_id").orderBy("doc_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1),
        s"mismatch at doc_id=${g.getLong(0)}: got ${g.getLong(1)}, want ${w.getLong(1)}")
    }
  }

  test("ids are contiguous 0..n-1 regardless of key distribution") {
    import spark.implicits._
    // clustered + negative + far outlier keys: bucket occupancy is
    // wildly unbalanced, values must not care
    val keys = Seq(-1000000L, -999999L, -5L, 0L, 1L, 2L, 3L, 7L, 1000000000L)
    val df = keys.toDF("k")
    val out = GlobalIds.assignIds(df, "k", nBuckets = 8)
      .orderBy("k").collect()
    assert(out.map(_.getLong(1)).toSeq == (0L until keys.length).toSeq)
    assert(out.map(_.getLong(0)).toSeq == keys.sorted)
  }

  test("empty input yields zero rows with the global_id column") {
    val out = GlobalIds.assignIds(docs.where(lit(false)), "doc_id")
    assert(out.columns.contains("global_id"))
    assert(out.count() == 0)
  }

  test("duplicate keys still get distinct contiguous ids") {
    import spark.implicits._
    val df = Seq(5L, 5L, 5L, 1L, 1L, 9L).toDF("k")
    val ids = GlobalIds.assignIds(df, "k", nBuckets = 4)
      .select("global_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 6L).toSeq)
  }

  test("single-bucket degenerate case (nBuckets=1) still matches the rank") {
    import spark.implicits._
    val df = Seq(3L, 1L, 2L).toDF("k")
    val out = GlobalIds.assignIds(df, "k", nBuckets = 1).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("binByCumWeight matches the one-window cumsum for any bucketing") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(11)
    val rows = (0 until 500).map(i => (i.toLong * 7 - 100, rng.nextInt(50).toLong))
    val df = rows.toDF("k", "w")
    val refW = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("bin", expr("coalesce(sum(w) over (order by k rows between unbounded preceding and 1 preceding), 0L) div 64L"))
      .select("k", "bin").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (buckets <- Seq(1, 7, 4096); parts <- Seq(1, 5)) {
      val got = GlobalIds.binByCumWeight(df.repartition(parts), "k", "w", 64L, buckets)
        .select("k", "bin").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sameElements(want), s"buckets=$buckets parts=$parts")
    }
  }

  test("binByCumWeight with weight 1 and perBin 1 degenerates to assignIds") {
    import spark.implicits._
    val df = Seq(5L, 1L, 9L, 3L).toDF("k").withColumn("one", lit(1L))
    val bins = GlobalIds.binByCumWeight(df, "k", "one", 1L)
      .select("k", "bin").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = GlobalIds.assignIds(df, "k")
      .select("k", "global_id").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bins.sameElements(ids))
  }

  test("shardPlan: shards are contiguous in doc order and start-aligned") {
    val plan = graft.operators.TextAnalysis.shardPlan(
      Tables.documents(spark, sfDir), tokensPerShard = 2048L).collect()
    assert(plan.nonEmpty)
    // shard ids non-decreasing in doc order, starting at 0
    val shards = plan.map(_.getLong(2))
    assert(shards.head == 0L)
    assert(shards.zip(shards.tail).forall { case (a, b) => b >= a })
    // each doc's shard = floor(cum-start / target), recomputed
    var cum = 0L
    plan.foreach { r =>
      assert(r.getLong(2) == cum / 2048L,
        s"doc ${r.getLong(0)}: shard ${r.getLong(2)} != ${cum / 2048L}")
      cum += r.getLong(1)
    }
  }
}
