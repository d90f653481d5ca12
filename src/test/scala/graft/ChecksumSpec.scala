package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the shared bench/profile checksum action ([[Checksum]]).
  *
  * This is the FuzzSpec "ANSI trap" discipline applied to the one
  * surface that lacked it: BENCH_r13's timing action —
  * `sum(xxhash64(...))` — deterministically threw
  * `[ARITHMETIC_OVERFLOW] long overflow` under Spark 4's default ANSI
  * mode for any output past a handful of rows, failing 96 of 104
  * timed queries while rc stayed 0. The fix (bit_xor: closed over
  * Long, order-independent, cannot overflow) is pinned here at 1000
  * rows under the session's untouched ANSI default, alongside the
  * failure mode itself so the WHY survives in executable form.
  */
class ChecksumSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions.{col, sum, xxhash64}

  private def rows1k = {
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, s"doc-$i", i * 0.5)).toDF("id", "text", "w")
  }

  test("session runs Spark 4's default ANSI mode (the pin's premise)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "GraftSession must not silently disable ANSI — every oracle and " +
        "fuzz pin was measured under it")
  }

  test("checksum action survives a 1000-row uniform-hash frame under default ANSI") {
    Checksum.fullEval(rows1k) // BENCH_r13's action threw here
    // and at a million rows of a real table, multi-partition
    Checksum.fullEval(graft.sources.Tables.lineitem(spark, sfDir))
  }

  test("the r13 sum(xxhash64) form really does overflow — why bit_xor") {
    val df = rows1k
    val ex = intercept[Exception] {
      df.select(xxhash64(df.columns.map(col): _*).as("_chk"))
        .agg(sum("_chk")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("overflow"),
      s"expected ARITHMETIC_OVERFLOW, got: ${ex.getMessage.take(200)}")
  }

  test("MapType frames fall back to full-evaluation foreach") {
    import spark.implicits._
    val withMap = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("id", "m")
    Checksum.fullEval(withMap) // xxhash64 would reject MapType
    // nested map (array<struct<map>>) is detected too
    import org.apache.spark.sql.functions.{array, struct}
    Checksum.fullEval(withMap.select(array(struct(col("m"))).as("nested")))
  }

  test("checksum value is partitioning-independent (bit_xor is order-free)") {
    val df = rows1k
    def chk(d: org.apache.spark.sql.DataFrame): Long =
      d.select(xxhash64(d.columns.map(col): _*).as("_chk"))
        .agg(org.apache.spark.sql.functions.bit_xor(col("_chk")))
        .collect()(0).getLong(0)
    assert(chk(df.repartition(1)) == chk(df.repartition(7)))
  }
}
