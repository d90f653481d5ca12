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
}
