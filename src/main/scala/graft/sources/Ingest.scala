package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch feed ingestion: manifest-tracked incremental loads and
  * quarantine-on-parse for provider feeds.
  *
  * The securities-master ingest problem at 100 TB is not reading
  * files, it is reading each file EXACTLY ONCE across daily reruns,
  * retries, and crashes — without a metastore. The pattern here:
  *
  *   1. list the landing dir, diff against a line-per-file manifest;
  *   2. read only the new files in ONE job, tagging rows with their
  *      source file (`input_file_name`), and write them partitioned by
  *      that tag under DYNAMIC partition overwrite — a replay of the
  *      same files overwrites its own partitions byte-for-byte instead
  *      of appending duplicates (idempotent by construction);
  *   3. only then advance the manifest (temp file + rename). A crash
  *      between 2 and 3 re-runs step 2 idempotently.
  *
  * The manifest stays small (one line per file); at millions of files
  * move it into a transactional store — the rename is atomic on HDFS
  * but only best-effort on object stores.
  */
object Ingest {

  final case class IngestResult(newFiles: Seq[String], rowsIngested: Long)

  /** Ingest any not-yet-seen `*.<format>` files from `srcDir` into the
    * `ingest_src`-partitioned table at `tableDir`. `format` is any
    * Spark file source ("parquet" default; "json" for [[RestFeed]]
    * landing pages, "csv" for flat feeds) — the manifest/overwrite
    * idempotency machinery is format-agnostic.
    */
  def incrementalIngest(spark: SparkSession, srcDir: String,
                        tableDir: String, manifestPath: String,
                        schema: StructType,
                        format: String = "parquet"): IngestResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val listed = fs.listStatus(src).filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith("." + format)).sorted.toSeq
    val mPath = new Path(manifestPath)
    val mfs = mPath.getFileSystem(conf)
    val done: Set[String] =
      if (!mfs.exists(mPath)) Set.empty
      else {
        val in = mfs.open(mPath)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toSet
        finally in.close()
      }
    val fresh = listed.filterNot(done)
    if (fresh.isEmpty) return IngestResult(Nil, 0L)

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def readFresh = spark.read.schema(schema).format(format).load(fresh: _*)
      val batch = readFresh
        .withColumn("ingest_src",
          regexp_extract(input_file_name(), s"([^/]+)\\.$format", 1))
      batch.write.mode("overwrite").partitionBy("ingest_src").parquet(tableDir)
      val rows = readFresh.count()
      // manifest advances ONLY after the data landed: temp + rename so a
      // reader never sees a half-written manifest
      val tmp = new Path(manifestPath + ".tmp")
      val out = mfs.create(tmp, true)
      try out.write((done ++ fresh).toSeq.sorted.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
      finally out.close()
      // rename/delete report failure as `false` on some filesystems
      // instead of throwing — a silent swap failure would leave an
      // empty/old manifest and re-ingest the whole landing dir forever,
      // so surface it loudly here (the data write is idempotent, so a
      // retry after this error is safe)
      if (mfs.exists(mPath) && !mfs.delete(mPath, false))
        throw new java.io.IOException(
          s"could not remove old manifest $manifestPath for swap")
      if (!mfs.rename(tmp, mPath))
        throw new java.io.IOException(
          s"manifest swap failed: rename($tmp, $manifestPath) returned false")
      IngestResult(fresh, rows)
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Schema-evolution read: parquet files written at different feed
    * versions (columns added over time, columns retired) load as ONE
    * frame shaped like `target` — `mergeSchema` unions the file
    * schemas, columns a version never wrote come back null, and the
    * final projection pins order and types (so a provider re-typing a
    * column is a visible cast, not silent drift). The securities-master
    * answer to "the vendor added a field last Tuesday": old files keep
    * working, new fields flow through, and nothing downstream re-plans.
    */
  def evolvingRead(spark: SparkSession, target: StructType,
                   paths: String*): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val withAll = target.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withAll.select(target.fields.map(f => col(f.name).cast(f.dataType)
      .as(f.name)).toSeq: _*)
  }

  /** The two halves of a quarantined feed parse, plus the cache handle:
    * call [[unpersist]] once both halves are consumed.
    */
  final case class QuarantinedFeed(good: DataFrame, quarantined: DataFrame,
                                   private val feed: DataFrame) {
    def unpersist(): Unit = { feed.unpersist(); () }
  }

  /** PERMISSIVE CSV parse split into (good, quarantined): bad rows keep
    * their raw line for replay instead of vanishing — a feed that
    * silently drops records fails audits, not jobs.
    */
  def quarantineCsv(spark: SparkSession, dir: String,
                    schema: StructType): QuarantinedFeed = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    // cached by contract: Spark refuses queries that reference ONLY the
    // internal corrupt-record column of a raw CSV scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching
    // the parsed feed is the documented way to split it, and both
    // halves are always consumed together anyway.
    val feed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache()
    QuarantinedFeed(
      feed.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      feed.filter(col("_corrupt_record").isNotNull),
      feed)
  }

  /** Holiday-calendar CSV loader: `exch,YYYY-MM-DD` rows → the
    * (exch, local_day) broadcast dim q144's calendar audit consumes
    * (`holidayFile` parameter). Rides the [[quarantineCsv]] permissive
    * parse, so a malformed date or truncated row lands in
    * `quarantined` for replay instead of silently shrinking the
    * session calendar — a dropped holiday row would silently mark an
    * off-session day as a trading session, the worst failure mode a
    * calendar feed has.
    */
  def holidayCsv(spark: SparkSession, dir: String): QuarantinedFeed = {
    import org.apache.spark.sql.types._
    val q = quarantineCsv(spark, dir, StructType(Seq(
      StructField("exch", StringType, nullable = false),
      StructField("holiday", DateType, nullable = false))))
    q.copy(good = q.good
      .filter(col("exch").isNotNull && col("holiday").isNotNull)
      .select(col("exch"), col("holiday").cast("timestamp").as("local_day")))
  }
}
