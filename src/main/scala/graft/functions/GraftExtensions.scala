package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for the custom expressions: registers them as native
  * SQL functions so `spark.sql("SELECT fingerprint64(text) ...")`
  * works. Two paths:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build time (the idiomatic plugin route), or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("fingerprint64",
      info("fingerprint64", "fingerprint64(str) - 64-bit polynomial content fingerprint"),
      (args: Seq[Expression]) => Fingerprint64(args.head)),
    ("simhash64",
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(array<string>, k) - k-element MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1), "k"))),
    ("hamming64",
      info("hamming64", "hamming64(a, b) - hamming distance of two 64-bit hashes"),
      (args: Seq[Expression]) => Hamming64(args.head, args(1))),
    ("dot_fd",
      info("dot_fd", "dot_fd(array<float>, array<float>) - double-precision dot product"),
      (args: Seq[Expression]) => DotFD(args.head, args(1))),
    ("shingle_hash64",
      info("shingle_hash64", "shingle_hash64(array<string>, n) - distinct hashed n-gram shingles"),
      (args: Seq[Expression]) => ShingleHash64(args.head, intArg(args(1), "n"))),
    ("rhp_sig",
      info("rhp_sig", "rhp_sig(array<float>, nPlanes, seed) - random-hyperplane LSH bucket"),
      (args: Seq[Expression]) =>
        RhpSig(args.head, intArg(args(1), "nPlanes"), longArg(args(2), "seed"))),
    ("hash_embed",
      info("hash_embed", "hash_embed(array<string>, dim) - L2-normalized feature-hashing embedding"),
      (args: Seq[Expression]) => HashEmbed(args.head, intArg(args(1), "dim"))),
    ("bpe_count",
      info("bpe_count", "bpe_count(array<string>) - greedy-BPE token count under the default merge table"),
      (args: Seq[Expression]) =>
        BpeCount(args.head, graft.operators.TextAnalysis.defaultBpeMerges)),
    ("bpe_tokens",
      info("bpe_tokens", "bpe_tokens(array<string>) - greedy-BPE pieces under the default merge table"),
      (args: Seq[Expression]) =>
        BpeTokens(args.head, graft.operators.TextAnalysis.defaultBpeMerges)),
    ("count_in_set",
      info("count_in_set", "count_in_set(array<string>, 'a,b,c') - tokens matching a comma-separated literal set"),
      (args: Seq[Expression]) => CountInSet(args.head, args(1) match {
        case Literal(s, _) if s != null => s.toString.split(",").toSeq
        case other => throw new IllegalArgumentException(
          s"count_in_set word list must be a string literal, got $other")
      })),
    ("sorted_intersect_count",
      info("sorted_intersect_count", "sorted_intersect_count(array<long>, array<long>) - |A ∩ B| of two sorted arrays (merge walk)"),
      (args: Seq[Expression]) => SortedIntersectCount(args.head, args(1))),
    ("normalize_ws",
      info("normalize_ws", "normalize_ws(str) - lowercase, 0x20-trim, \\s+ runs collapsed (one byte scan)"),
      (args: Seq[Expression]) => NormalizeWs(args.head)),
    ("ws_tokens",
      info("ws_tokens", "ws_tokens(str) - whitespace tokens of normalize_ws (one byte scan)"),
      (args: Seq[Expression]) => WsTokens(args.head)),
    ("count_punct",
      info("count_punct", "count_punct(str) - code points outside ASCII alnum/\\s (regex-free)"),
      (args: Seq[Expression]) => CountPunct(args.head)),
    ("count_upper_ascii",
      info("count_upper_ascii", "count_upper_ascii(str) - [A-Z] count (regex-free)"),
      (args: Seq[Expression]) => CountUpperAscii(args.head)),
    ("count_token_runs",
      info("count_token_runs", "count_token_runs(str) - letter runs | digit runs | other code points (BPE-ish lexer count)"),
      (args: Seq[Expression]) => CountTokenRuns(args.head)))

  /** Register every graft function on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, b) => Bridge.registerFunction(spark, name, i, b) }
}
