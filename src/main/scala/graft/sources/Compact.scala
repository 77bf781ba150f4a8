package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a FLAT parquet directory into
  * ~target-size files. The 100 TB housekeeping problem — per-batch
  * ingests accrete kilobyte files whose open/footer overhead
  * eventually dominates scans; periodic compaction restores scan
  * throughput.
  *
  * Scope guards (loud errors, never silent corruption):
  *   - flat directories only — a partitioned table (subdirectories)
  *     must be compacted per partition leaf, or the rewrite would
  *     flatten the layout and break partition-overwrite idempotence;
  *   - refuses streaming-sink output (`_spark_metadata` present):
  *     the sink's file log, not the listing, defines visibility there;
  *   - refuses to run over leftovers of a crashed previous compaction
  *     (`.compact_tmp` / `.pre_compact` present) — resolve those first.
  *
  * Swap sequence: complete sibling copy → original renamed aside →
  * copy renamed in → backup deleted. NOT atomic: there is a window
  * where the table path does not exist, and a crash inside it leaves
  * the `.pre_compact` backup for manual rollback — run compaction in
  * the maintenance window bare parquet implies. With concurrent
  * readers/writers, use a transactional table format instead.
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, rows: Long)

  def compact(spark: SparkSession, tableDir: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // siblings of the normalized path — string concat on a trailing
    // slash would nest them INSIDE the table and wedge the swap
    val tmp = new Path(dir.getParent, dir.getName + ".compact_tmp")
    val bak = new Path(dir.getParent, dir.getName + ".pre_compact")
    require(!fs.exists(tmp) && !fs.exists(bak),
      s"leftover $tmp or $bak from a previous compaction — resolve first " +
        "(rename .pre_compact back to roll back, or delete both to discard)")
    val entries = fs.listStatus(dir)
    require(!entries.exists(e => e.isDirectory && e.getPath.getName == "_spark_metadata"),
      s"$tableDir is a streaming-sink table (_spark_metadata): its file log " +
        "defines visibility — compact via the sink's own mechanism instead")
    require(!entries.exists(_.isDirectory),
      s"$tableDir contains subdirectories (partitioned layout) — compact " +
        "each partition leaf directory instead of the root")
    val files = entries.filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files in $tableDir")
    val bytes = files.map(_.getLen).sum
    // parquet re-encodes (dictionary/RLE) so output size != input size,
    // but input bytes are the only prior available before the rewrite;
    // ceil so the result never lands below one file
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(tableDir)
      .repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(dir, bak))
      throw new java.io.IOException(s"compaction swap: could not move $dir aside")
    if (!fs.rename(tmp, dir)) {
      if (!fs.rename(bak, dir))
        throw new java.io.IOException(
          s"compaction swap failed AND rollback failed: table is at $bak, " +
            s"compacted copy at $tmp, nothing at $dir — restore manually")
      throw new java.io.IOException(
        s"compaction swap: could not move $tmp in (original rolled back)")
    }
    if (!fs.delete(bak, true))
      throw new java.io.IOException(
        s"compaction succeeded but backup $bak could not be deleted — " +
          "remove it manually or the next run will refuse to start")
    // row count from the compacted output: a handful of large files,
    // far cheaper than a second scan of the small-file input
    val rows = spark.read.parquet(tableDir).count()
    val after = fs.listStatus(dir).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactStats(files.length, after, bytes, rows)
  }
}
