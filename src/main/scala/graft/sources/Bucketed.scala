package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support (SURVEY.md §5): co-located joins.
  *
  * Writing both sides of a recurring fact-fact join bucketed (and
  * sorted) by the join key lets every subsequent sort-merge join skip
  * BOTH the shuffle and the sort — at 100 TB that's the difference
  * between re-shuffling the fact table on every query and never
  * shuffling it again. BucketedSpec proves the property by asserting
  * the joined plan contains no Exchange.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so joins on the bucket key avoid the shuffle). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)

  /** The warehouse directory a table's data lives in (managed tables
    * and [[reRegister]]ed external ones share this layout). */
  def warehousePath(spark: org.apache.spark.sql.SparkSession,
                    table: String): java.nio.file.Path = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    // the catalog lowercases identifiers; the directory is lowercase too
    java.nio.file.Paths.get(warehouse, table.toLowerCase)
  }

  /** Re-register a bucketed table whose CATALOG entry is gone but
    * whose warehouse directory survived — the session-restart case
    * under the default in-memory catalog, where every table entry dies
    * with the JVM while the parquet + bucket files persist. Creates an
    * external bucketed table over the existing location (same bucket
    * spec the data was written with, so bucket-aware plans stay
    * exchange-free). Returns false when the directory is gone too —
    * genuinely lost data. No-op (true) when the catalog already has
    * the table. */
  def reRegister(spark: org.apache.spark.sql.SparkSession, table: String,
                 schemaDdl: String, keyCol: String, buckets: Int = 8): Boolean = {
    if (spark.catalog.tableExists(table)) return true
    val loc = warehousePath(spark, table)
    if (!java.nio.file.Files.exists(loc)) return false
    spark.sql(
      s"CREATE TABLE $table ($schemaDdl) USING parquet " +
        s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS " +
        s"LOCATION '${loc.toUri}'")
    true
  }

  /** Drop a managed table AND its leftover warehouse location (an
    * in-memory catalog forgets tables across sessions while the
    * filesystem keeps the data — recreating would then fail with
    * LOCATION_ALREADY_EXISTS). */
  def dropTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    // the catalog lowercases identifiers; the directory is lowercase too
    val loc = java.nio.file.Paths.get(warehouse, table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
