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
