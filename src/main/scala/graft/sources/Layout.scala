package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Data-layout control for scan-time skipping.
  *
  * At 100 TB the cheapest predicate is the one that never reads: parquet
  * stores per-row-group min/max statistics, and a reader with a pushed
  * filter skips any row group whose range excludes the predicate. That
  * only pays off if the writer CLUSTERS rows so ranges are narrow —
  * a randomly-laid-out table has every row group spanning the whole key
  * domain and skips nothing. [[clusteredWrite]] produces the layout;
  * [[rowGroupStats]] reads the footers back so an audit (or a test) can
  * verify the ranges actually are disjoint rather than trusting the
  * write path.
  */
object Layout {

  /** Range-partition on `keys`, sort within each partition, write as
    * parquet: each output file covers a narrow, non-overlapping key
    * range (and row groups within a file are sorted runs), so any
    * footer-reading scan skips everything outside a selective
    * predicate's range. The repartitionByRange does one sampling pass +
    * one shuffle — the classic one-time layout cost traded for every
    * subsequent scan's pruning.
    */
  def clusteredWrite(df: DataFrame, outDir: String, numFiles: Int,
                     keys: String*): Unit = {
    require(keys.nonEmpty, "clusteredWrite needs at least one cluster key")
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** HIVE-PARTITIONED layout: one directory per distinct value of
    * `partitionCol` — the third skipping tier next to
    * [[clusteredWrite]] (row-group ranges) and [[zorderWrite]]
    * (multi-key cells). Partition directories are the only layout the
    * optimizer can prune with a RUNTIME value set: when a partitioned
    * fact joins a dimension on the partition column and the dimension
    * carries a selective filter, Spark inserts a dynamic-partition-
    * pruning subquery that evaluates the dim side first and feeds the
    * surviving keys into the fact scan's PartitionFilters — at 100 TB
    * the fact side never lists, opens, or reads the pruned
    * directories at all (file skipping decided before the scan, not
    * per row group). LayoutSpec pins the `dynamicpruning` subquery in
    * the physical plan. Choose a LOW-cardinality column (priorities,
    * dates, sources): every distinct value is a directory, and a
    * high-cardinality partition key melts the namenode before it
    * helps the reader.
    */
  def partitionedWrite(df: DataFrame, outDir: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)

  /** Z-ORDER layout: interleave-bit clustering across SEVERAL keys so
    * row-group pruning works on every one of them at once — the
    * multi-dimensional complement to [[clusteredWrite]], which makes
    * one key perfectly skippable and leaves the others spanning the
    * full domain in every file. Each key is linearly bucketed into
    * 2^bits cells between its observed min/max (one column-pruned agg;
    * the Morton-curve standard for numeric keys), the per-key bucket
    * bits interleave into one z-value — a single codegen'd
    * shiftleft/OR expression, no UDF — and the frame range-partitions
    * + sorts on that z expression (never materialized into the
    * output). Locality math: with n files over k keys, each file
    * covers ~n^(−1/k) of every key's domain instead of 1/n of one key
    * and 100% of the rest — the layout behind "WHERE order BETWEEN …
    * AND part BETWEEN …" reading a handful of row groups at 100 TB.
    * LayoutSpec audits the claim from the written footers against a
    * single-key layout, not from this comment.
    */
  def zorderWrite(df: DataFrame, outDir: String, numFiles: Int,
                  bits: Int, keys: String*): Unit = {
    require(keys.size >= 2, "zorderWrite needs at least two cluster keys")
    require(bits * keys.size <= 62, "z-value must fit a long")
    import org.apache.spark.sql.functions._
    val k = keys.size
    val cells = 1L << bits
    // one scan for the per-key domains (column-pruned, map-side agg)
    val aggs = keys.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val z = keys.zipWithIndex.map { case (c, ci) =>
      val mn = row.getAs[Double](s"mn_$c")
      val mx = row.getAs[Double](s"mx_$c")
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      val bucket = least(
        floor((col(c).cast("double") - lit(mn)) / lit(span) * lit(cells))
          .cast("long"),
        lit(cells - 1L))
      (0 until bits).map(i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * k + ci)
          : org.apache.spark.sql.Column)
        .reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(outDir)
  }

  /** One row group's footer statistics for a long-typed column. */
  final case class RowGroupRange(file: String, rows: Long,
                                 min: Long, max: Long)

  /** Per-row-group (min, max) footer statistics of a BIGINT column
    * across every `*.parquet` file under `dir` — the layout audit that
    * proves (or disproves) skippability. Driver-side and bounded by
    * file count: run it on a partition's worth of files, not a whole
    * 100 TB table (at that scale the same loop runs distributed over a
    * file manifest).
    */
  def rowGroupStats(spark: SparkSession, dir: String,
                    column: String): Seq[RowGroupRange] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
    files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"column $column not found in ${f.getName}"))
          val stats = chunk.getStatistics
          require(stats != null && !stats.isEmpty,
            s"no statistics for $column in ${f.getName} — skipping impossible")
          RowGroupRange(f.getName, block.getRowCount,
            stats.genericGetMin.toString.toLong,
            stats.genericGetMax.toString.toLong)
        }
      } finally reader.close()
    }
  }
}
