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

  test("bpeTokens emits the pieces bpeWord counts") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.functions.col
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val docs = Seq((1L, "LOWER  low"), (2L, ""), (3L, "wool q"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenizeBpe(docs, merges).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // "lower low" -> low er | low ; empty doc emits nothing;
    // "wool q" has no applicable merge -> code points
    assert(got.toSeq == Seq(
      (1L, 0, "low"), (1L, 1, "er"), (1L, 2, "low"),
      (3L, 0, "w"), (3L, 1, "o"), (3L, 2, "o"), (3L, 3, "l"), (3L, 4, "q")))
    // count agreement with the counting expression, via SQL-level
    // size() so the array form is exercised too
    val both = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        GraftFunctions.bpeTokens(TextAnalysis.tokens(col("text")), merges)).as("np"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(both == Map(1L -> 3, 2L -> 0, 3L -> 5))
  }

  test("Spark pieces match the independent Python reference tokens fixture") {
    import org.apache.spark.sql.functions.col
    val in = getClass.getResourceAsStream("/graft/bpe_tokens_sf0.001.json")
    assert(in != null, "tokens fixture missing — run tools/bpe_reference.py " +
      "with the 4th arg")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // {"0": ["the", "fast", ...], ...}
    val expected = "\"(\\d+)\":\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(json).map { m =>
      m.group(1).toLong ->
        "\"([^\"]*)\"".r.findAllMatchIn(m.group(2)).map(_.group(1)).toVector
    }.toMap
    assert(expected.size == 50, s"fixture should carry 50 docs: ${expected.size}")
    val got = TextAnalysis.tokenizeBpe(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 50))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    assert(got.keySet == expected.keySet)
    val bad = expected.collect {
      case (id, ps) if got(id) != ps =>
        (id, ps.zip(got(id)).indexWhere { case (a, b) => a != b })
    }
    assert(bad.isEmpty, s"piece drift at (doc, first diff pos): ${bad.take(5)}")
  }

  test("tokenization reconstructs the normalized text and counts agree corpus-wide") {
    import org.apache.spark.sql.functions.{col, collect_list, concat_ws, struct}
    val docs = Tables.documents(spark, sfDir)
    // per-doc piece concatenation == normalized text with spaces
    // removed (BPE only ever splits within words), and piece count ==
    // the counting expression — both over ALL 500 docs
    val pieces = TextAnalysis.tokenizeBpe(docs)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("piece"))).as("ps"))
      .collect().map { r =>
        val ps = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ps")
          .sortBy(_.getInt(0)).map(_.getString(1))
        r.getAs[Long]("doc_id") -> ps
      }.toMap
    val norm = docs.select(col("doc_id"),
        TextAnalysis.normalize(col("text")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = TextAnalysis.tokenCountBpe(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    norm.foreach { case (id, nt) =>
      val ps = pieces.getOrElse(id, Seq.empty)
      assert(ps.mkString == nt.replace(" ", ""),
        s"doc $id: pieces do not reconstruct the normalized text")
      assert(ps.length.toLong == counts(id),
        s"doc $id: ${ps.length} pieces vs count ${counts(id)}")
    }
  }

  test("trainBpe reproduces the gen_bpe_merges.py-trained resource merge for merge") {
    // the shipped /graft/bpe_merges.txt WAS trained on this sf0.001
    // corpus by the independent Python script — the Spark trainer must
    // reproduce it exactly, rank order included
    val expected = TextAnalysis.defaultBpeMerges
    val got = TextAnalysis.trainBpe(
        Tables.documents(spark, "/root/testdata/sf0.001"), expected.size)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got.size == expected.size,
      s"merge count drifted: ${got.size} vs ${expected.size}")
    val firstBad = got.zip(expected).zipWithIndex.find { case ((g, e), _) => g != e }
    assert(firstBad.isEmpty, s"first divergent merge: $firstBad")
  }

  /** The naive full-recompute merge learner (the pre-incremental
    * implementation, O(M · Σ|w|)): every round recounts all adjacent
    * pairs from scratch. Kept here as the semantic reference the fast
    * incremental learner must match merge for merge. */
  private def naiveLearnMerges(wf: Array[(String, Long)],
                               nMerges: Int): Vector[(String, String)] = {
    val freq = wf.toMap
    var seqs: Map[String, Vector[String]] =
      wf.iterator.map { case (w, _) => w -> w.map(_.toString).toVector }.toMap
    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < nMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, seq) <- seqs; i <- 0 until seq.length - 1) {
        val p = (seq(i), seq(i + 1))
        pairs.update(p, pairs.getOrElse(p, 0L) + freq(w))
      }
      if (pairs.isEmpty) done = true
      else {
        val (best, c) = pairs.minBy { case (p, cnt) => (-cnt, p) }
        if (c < 2) done = true
        else {
          merges += best
          n += 1
          val (a, b) = best
          val ab = a + b
          seqs = seqs.map { case (w, seq) =>
            if (!seq.contains(a)) w -> seq
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < seq.length) {
                if (i < seq.length - 1 && seq(i) == a && seq(i + 1) == b) {
                  out += ab; i += 2
                } else { out += seq(i); i += 1 }
              }
              w -> out.result()
            }
          }
        }
      }
    }
    merges.result()
  }

  /** Word-frequency table of the synthetic BPE corpus resource, in
    * trainBpe's deterministic (freq desc, word asc) order. */
  private lazy val synthDocs = {
    import spark.implicits._
    val in = getClass.getResourceAsStream("/graft/bpe_synth_corpus.txt")
    assert(in != null, "corpus resource missing — run tools/gen_bpe_synth.py")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    assert(lines.size > 100)
    lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("incremental trainBpe matches gen_bpe_merges.py AND the naive " +
       "reference at 2400 merges (real-vocab headroom)") {
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    // fixture trained by the independent Python script on this corpus
    val fin = getClass.getResourceAsStream("/graft/bpe_merges_synth.txt")
    assert(fin != null, "fixture missing — run tools/gen_bpe_synth.py")
    val expected = try scala.io.Source.fromInputStream(fin, "UTF-8").getLines()
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l => val sp = l.split(" ", 2); (sp(0), sp(1)) }.toVector
      finally fin.close()
    assert(expected.size >= 2000,
      s"fixture should prove >=2000-merge headroom: ${expected.size}")

    val t0 = System.nanoTime()
    val got = TextAnalysis.trainBpe(synthDocs, expected.size)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toVector
    val incMs = (System.nanoTime() - t0) / 1e6
    assert(got.size == expected.size)
    val firstBad = got.zip(expected).zipWithIndex.find { case ((g, e), _) => g != e }
    assert(firstBad.isEmpty, s"first divergence vs Python fixture: $firstBad")

    // and merge-for-merge vs the naive full-recompute learner on the
    // identical word table (covers the driver loop in isolation)
    val wf = synthDocs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val t1 = System.nanoTime()
    val naive = naiveLearnMerges(wf, expected.size)
    val naiveMs = (System.nanoTime() - t1) / 1e6
    val t2 = System.nanoTime()
    val fast = TextAnalysis.learnMerges(wf, expected.size)
    val fastMs = (System.nanoTime() - t2) / 1e6
    assert(fast == naive, "incremental learner drifted from naive reference")
    info(f"learnMerges ${expected.size} merges: naive ${naiveMs}%.0f ms, " +
         f"incremental ${fastMs}%.0f ms (${naiveMs / fastMs}%.1fx); " +
         f"end-to-end trainBpe ${incMs}%.0f ms")
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
