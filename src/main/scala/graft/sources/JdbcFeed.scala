package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source reads: the relational-provider half of the ingest
  * story (the REST half is [[RestFeed]]).
  *
  * The scale discipline for pulling a big provider table over JDBC is
  * PARTITIONED reads — one connection per numeric key stripe so the
  * pull parallelizes across executors instead of single-streaming
  * through the driver — with the stripe bounds measured from the
  * source itself (one cheap min/max query) rather than guessed.
  * Snapshots land as parquet tagged with a caller-supplied snapshot
  * id, so a re-run of the same snapshot overwrites itself (the same
  * idempotency contract as [[Ingest.incrementalIngest]]).
  */
object JdbcFeed {

  /** Partition-parallel read of `table`: stripes `partitionCol` (a
    * numeric column, ideally the primary key) into `numPartitions`
    * ranges bounded by the source's own min/max.
    */
  def partitionedRead(spark: SparkSession, url: String, table: String,
                      partitionCol: String, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame = {
    // one single-row bounds query against the source; the partitioned
    // read then opens numPartitions independent range-striped cursors
    val bounds = spark.read.jdbc(url,
      s"(SELECT MIN($partitionCol) AS lo, MAX($partitionCol) AS hi FROM $table) b",
      props)
    val row = bounds.collect()(0)
    if (row.isNullAt(0)) // empty table: a plain read keeps the schema
      return spark.read.jdbc(url, table, props)
    val (lo, hi) = (row.getAs[Number](0).longValue, row.getAs[Number](1).longValue)
    spark.read.jdbc(url, table, partitionCol, lo, hi,
      math.max(1, numPartitions), props)
  }

  /** Incremental watermark pull: land only rows with `keyCol` above
    * the persisted high-water mark (a monotone numeric key — an
    * append-only feed's sequence/id column), then advance the mark.
    *
    * Same crash discipline as [[Ingest.incrementalIngest]]: data lands
    * FIRST (append of a strictly-new key range — a re-run after a
    * crash between land and mark-advance re-reads the same range, and
    * the batch tag makes the replay overwrite itself), the watermark
    * file advances LAST via tempfile + rename. The pull itself is
    * partition-parallel over the new key range.
    *
    * @return number of rows landed (0 when the source has nothing new)
    */
  def incrementalPull(spark: SparkSession, url: String, table: String,
                      keyCol: String, numPartitions: Int,
                      tableDir: String, watermarkPath: String,
                      props: Properties = new Properties()): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val wmPath = new org.apache.hadoop.fs.Path(watermarkPath)
    val fs = wmPath.getFileSystem(conf)
    val prev: Option[Long] =
      if (!fs.exists(wmPath)) None
      else {
        val in = fs.open(wmPath)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
        finally in.close()
      }
    val pred = prev.map(w => s"$keyCol > $w").getOrElse("1=1")
    val bounds = spark.read.jdbc(url,
      s"(SELECT MIN($keyCol) AS lo, MAX($keyCol) AS hi FROM $table WHERE $pred) b",
      props)
    val row = bounds.collect()(0)
    if (row.isNullAt(0)) return 0L
    val (lo, hi) = (row.getAs[Number](0).longValue, row.getAs[Number](1).longValue)
    val batch = spark.read.jdbc(url,
      s"(SELECT * FROM $table WHERE $pred) t",
      keyCol, lo, hi, math.max(1, numPartitions), props)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val n =
      try {
        // the batch is tagged by its own key range: a crash-replay of
        // the identical range overwrites its own partition, so rows are
        // never duplicated even though the write is an append overall
        batch.withColumn("ingest_batch", lit(s"k$lo-$hi"))
          .write.mode(SaveMode.Overwrite).partitionBy("ingest_batch")
          .parquet(tableDir)
        spark.read.parquet(tableDir)
          .filter(col("ingest_batch") === s"k$lo-$hi").count()
      } finally prevMode match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    val tmp = new org.apache.hadoop.fs.Path(watermarkPath + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(hi.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(wmPath) && !fs.delete(wmPath, false))
      throw new java.io.IOException(s"could not remove old watermark $watermarkPath")
    if (!fs.rename(tmp, wmPath))
      throw new java.io.IOException(s"watermark swap failed for $watermarkPath")
    n
  }

  /** Land one snapshot of `table` as parquet under `tableDir`,
    * partitioned by the caller's `snapshotId` tag (dynamic overwrite:
    * re-running a snapshot replaces exactly itself).
    */
  def snapshotToParquet(spark: SparkSession, url: String, table: String,
                        partitionCol: String, numPartitions: Int,
                        tableDir: String, snapshotId: String,
                        props: Properties = new Properties()): Long = {
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val df = partitionedRead(spark, url, table, partitionCol,
        numPartitions, props)
      df.withColumn("snapshot_id", lit(snapshotId))
        .write.mode(SaveMode.Overwrite).partitionBy("snapshot_id")
        .parquet(tableDir)
      spark.read.parquet(tableDir)
        .filter(col("snapshot_id") === snapshotId).count()
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
