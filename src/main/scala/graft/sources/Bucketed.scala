package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY.md §5): co-located joins.
  *
  * Writing both sides of a recurring fact-fact join bucketed (and
  * sorted) by the join key lets every subsequent sort-merge join skip
  * BOTH the shuffle and the sort — at 100 TB that's the difference
  * between re-shuffling the fact table on every query and never
  * shuffling it again. BucketedSpec proves the property by asserting
  * the joined plan contains no Exchange.
  *
  * All filesystem access goes through Hadoop `FileSystem` resolved
  * from the location's own scheme, so the restart/re-registration
  * story works unchanged on an HDFS/S3 warehouse, not just `file:`.
  */
object Bucketed {

  /** Sidecar recording the bucket spec beside the data. The catalog
    * entry dies with the JVM under the default in-memory catalog while
    * the part files survive; re-registering with a GUESSED bucket count
    * would declare a wrong `CLUSTERED BY ... INTO n BUCKETS` spec and
    * bucket-trusting joins would silently return wrong results —
    * [[reRegister]] derives the spec from this marker instead.
    * Underscore prefix: parquet readers ignore it. */
  private val BucketMarker = "_graft_buckets"

  /** Bucket id embedded in a bucketed part-file name
    * (`part-00000-<uuid>_00003.c000...`). */
  private val BucketIdPat = "_(\\d{5})\\.".r

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `df` as a bucketed+sorted managed parquet table, recording
    * the bucket spec in the [[BucketMarker]] sidecar (the marker moves
    * with the directory through `ALTER TABLE ... RENAME`, so staging
    * swaps keep it). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int = 8): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
    val spark = df.sparkSession
    val loc = warehousePath(spark, table)
    val out = fs(spark, loc).create(new Path(loc, BucketMarker), true)
    try out.write(s"$buckets $keyCol\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so joins on the bucket key avoid the shuffle). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** The directory a table's data lives in: the CATALOG's reported
    * location when the table is registered (authoritative — external
    * tables can live anywhere), else the warehouse-layout slot the
    * managed writer would use. Hadoop path — scheme-preserving. */
  def warehousePath(spark: SparkSession, table: String): Path = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val cat = spark.sessionState.catalog
    val ident = TableIdentifier(table)
    if (cat.tableExists(ident)) new Path(cat.getTableMetadata(ident).location)
    else
      // the catalog lowercases identifiers; the directory is lowercase too
      new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
        table.toLowerCase)
  }

  /** The bucket spec recorded beside the data, if the directory was
    * written by [[writeBucketed]]: (buckets, keyCol). */
  private def readMarker(f: FileSystem, loc: Path): Option[(Int, String)] = {
    val p = new Path(loc, BucketMarker)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      txt.split("\\s+") match {
        case Array(n, k) => Some((n.toInt, k))
        case _           => None
      }
    }
  }

  /** Highest bucket id among the part files under `loc`, or -1 when
    * none parse (non-bucketed layout). */
  private def maxBucketId(f: FileSystem, loc: Path): Int =
    f.listStatus(loc).iterator.map(_.getPath.getName)
      .filter(_.startsWith("part-"))
      .flatMap(n => BucketIdPat.findFirstMatchIn(n).map(_.group(1).toInt))
      .foldLeft(-1)(math.max)

  /** Re-register a bucketed table whose CATALOG entry is gone but
    * whose data directory survived — the session-restart case under
    * the default in-memory catalog, where every table entry dies with
    * the JVM while the parquet + bucket files persist. Creates an
    * external bucketed table over the existing location.
    *
    * The bucket spec comes from the [[BucketMarker]] the writer left
    * beside the data and is VALIDATED against the part files' embedded
    * bucket ids — declaring a wrong `INTO n BUCKETS` would make every
    * bucket-trusting join silently wrong, so a mismatch throws instead
    * of registering. A directory WITHOUT a marker is refused by
    * default: the caller's `buckets` is a guess, and the embedded-id
    * check below only catches a count declared LOWER than the data's
    * (data in 4 buckets, declared 8, passes maxId < n and registers a
    * wrong spec). `trustDeclaredSpec = true` opts into registering a
    * marker-less pre-marker directory with the declared spec — on the
    * caller's head. Returns false when the directory is gone too —
    * genuinely lost data. No-op (true) when the catalog already has
    * the table. */
  def reRegister(spark: SparkSession, table: String,
                 schemaDdl: String, keyCol: String, buckets: Int = 8,
                 trustDeclaredSpec: Boolean = false): Boolean = {
    if (spark.catalog.tableExists(table)) return true
    val loc = warehousePath(spark, table)
    val f = fs(spark, loc)
    if (!f.exists(loc)) return false
    val (n, key) = readMarker(f, loc).getOrElse {
      require(trustDeclaredSpec,
        s"no $BucketMarker marker at $loc: refusing to re-register with the " +
          "caller-declared spec — a wrong bucket count silently corrupts every " +
          "bucket-trusting join. Pass trustDeclaredSpec = true to override " +
          "for a pre-marker directory whose spec is known out of band.")
      (buckets, keyCol)
    }
    require(key == keyCol,
      s"bucket marker at $loc records key '$key' but re-registration " +
        s"declares '$keyCol' — wrong table or corrupted layout")
    val maxId = maxBucketId(f, loc)
    require(maxId < n,
      s"data at $loc has bucket id $maxId but the spec says $n buckets — " +
        "re-registering would declare a wrong bucket layout")
    spark.sql(
      s"CREATE TABLE $table ($schemaDdl) USING parquet " +
        s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $n BUCKETS " +
        s"LOCATION '${loc.toUri}'")
    true
  }

  /** Drop a table AND its leftover data directory (an in-memory
    * catalog forgets tables across sessions while the filesystem keeps
    * the data — recreating would then fail with
    * LOCATION_ALREADY_EXISTS; and DROP on a re-registered EXTERNAL
    * table leaves its directory behind by design). */
  def dropTable(spark: SparkSession, table: String): Unit = {
    // resolve the location while the catalog entry still exists
    val loc = warehousePath(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val f = fs(spark, loc)
    if (f.exists(loc)) { f.delete(loc, true); () }
  }
}
