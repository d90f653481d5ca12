package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling (SURVEY.md §5): salting utilities for the cases AQE's
  * runtime skew splitting can't reach (skewed AGGREGATION keys, and
  * skewed joins where neither side broadcasts).
  *
  * Two-phase salted aggregation splits a hot key across `salts`
  * reducers in stage 1 and merges the partials in stage 2 — the
  * classic fix when one entity owns 1% of a 100 TB table and a plain
  * groupBy would pin its whole history on one task.
  */
object Salting {

  /** Deterministic salt in [0, salts) from a row-identity column. */
  def salt(idCol: Column, salts: Int): Column = pmod(hash(idCol), lit(salts))

  /** Two-phase salted sum/count aggregate per key. Algebraic
    * aggregates only (sum/count/min/max re-merge exactly). */
  def saltedAgg(df: DataFrame, keyCol: String, idCol: String, valueCol: String,
                salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(col(idCol), salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n_rows"))

  /** Salted equi-join for a skewed fact key: the fact side gets a
    * deterministic salt, the (smaller, but not broadcastable) build
    * side is replicated across all salt values, and the join key
    * becomes (key, salt) — hot keys spread over `salts` tasks. */
  def saltedJoin(fact: DataFrame, build: DataFrame, keyCol: String,
                 idCol: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(col(idCol), salts))
    val replicated = build.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}
