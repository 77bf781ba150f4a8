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
