package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory into ~target-size
  * files. The 100 TB housekeeping problem — streaming sinks and
  * per-batch ingests (e.g. [[Ingest.incrementalIngest]]'s per-file
  * partitions) accrete kilobyte files whose open/footer overhead
  * eventually dominates scans; periodic compaction restores scan
  * throughput.
  *
  * Rewrite-then-swap: the compacted copy is written COMPLETELY to a
  * sibling temp dir, the original renamed aside, the copy renamed in,
  * the original deleted — readers see either the old or the new
  * directory, and a crash mid-swap leaves the `.pre_compact` backup to
  * roll back from. (On object stores or with concurrent writers, use a
  * transactional table format instead — this is the bare-parquet
  * version.)
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, rows: Long)

  def compact(spark: SparkSession, tableDir: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    // parquet re-encodes (dictionary/RLE) so output size != input size,
    // but input bytes are the only prior available before the rewrite;
    // ceil so the result never lands below one file
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(tableDir)
    val rows = df.count()
    val tmp = new Path(tableDir + ".compact_tmp")
    val bak = new Path(tableDir + ".pre_compact")
    df.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(dir, bak))
      throw new java.io.IOException(s"compaction swap: could not move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // roll back; original data untouched
      throw new java.io.IOException(s"compaction swap: could not move $tmp in")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(dir).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactStats(files.length, after, bytes, rows)
  }
}
