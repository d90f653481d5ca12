package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Greedy-BPE token counting: hand-computed merge behavior plus the
  * full-corpus parity fixture computed by the INDEPENDENT Python
  * implementation (tools/bpe_reference.py over the committed
  * tools/gen_bpe_merges.py table) — any drift between the Scala
  * kernel and the reference algorithm fails here row by row. */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  test("bpeWord applies merges greedily by rank, left to right") {
    import graft.functions.{BpeTable, TextHash}
    // ranks: (l,o)=0, (lo,w)=1, (e,r)=2
    val t = new BpeTable(Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(TextHash.bpeWord("lower", t.ranks) == 2) // l o w e r -> lo -> low -> er
    assert(TextHash.bpeWord("low", t.ranks) == 1)   // l o w -> lo w -> low
    assert(TextHash.bpeWord("wool", t.ranks) == 4)  // no adjacent merge applies
    assert(TextHash.bpeWord("x", t.ranks) == 1)
    assert(TextHash.bpeWord("", t.ranks) == 0)
    // overlapping occurrences merge left to right: "lolo" -> lo lo
    assert(TextHash.bpeWord("lolo", t.ranks) == 2)
  }

  test("tokenCountBpe sums per-word counts over normalized tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "LOWER  low"),   // normalize -> "lower low": (low,er)=2 + low=1
      (2L, ""),             // empty doc counts 0
      (3L, "q"))            // unknown single char
      .toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val out = TextAnalysis.tokenCountBpe(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 3L)))
    assert(out(2L) == ((1L, 0L)))
    assert(out(3L) == ((1L, 1L)))
  }

  test("Spark counts match the independent Python reference fixture") {
    val in = getClass.getResourceAsStream("/graft/bpe_expected_sf0.001.json")
    assert(in != null, "fixture resource missing — run tools/bpe_reference.py")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val expected = "\"(\\d+)\":\\s*(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap
    assert(expected.size == 500, s"fixture should carry 500 docs: ${expected.size}")
    val got = TextAnalysis.tokenCountBpe(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    val bad = expected.collect {
      case (id, n) if got(id) != n => (id, n, got(id))
    }
    assert(bad.isEmpty, s"reference mismatch (doc, expected, got): ${bad.take(5)}")
  }
}
