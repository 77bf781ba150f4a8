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
    * FIRST, the watermark file advances LAST via tempfile + rename.
    * The landed set is EXACTLY the measured range (w, hi] — the pull
    * predicate is bounded above by the pre-measured hi, so rows
    * appended mid-pull wait for the next batch — and the batch
    * partition is tagged by the from-watermark, so any crash-replay
    * (even one racing new appends) overwrites its own partition
    * instead of duplicating the overlap. The pull itself is
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
    // the pull predicate is bounded to the MEASURED range (w, hi]:
    // rows appended between the bounds query and the pull (key > hi)
    // belong to the NEXT batch — an unbounded `key > w` would land
    // them here AND on the next pull, duplicating them. The recorded
    // watermark (hi) therefore always equals the max key actually
    // landed.
    val batch = spark.read.jdbc(url,
      s"(SELECT * FROM $table WHERE $keyCol >= $lo AND $keyCol <= $hi) t",
      keyCol, lo, hi, math.max(1, numPartitions), props)
    // the batch partition is tagged by the FROM-watermark, which is
    // the one value every replay of this pull shares: a crash between
    // land and mark-advance re-runs from the same watermark and
    // OVERWRITES this exact partition — even if the feed appended more
    // rows in between (the replay simply lands a longer (w, hi']
    // range into the same tag). A range-derived tag would instead
    // mint a second partition and duplicate the overlap.
    val tag = s"w${prev.map(_.toString).getOrElse("init")}"
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val n =
      try {
        batch.withColumn("ingest_batch", lit(tag))
          .write.mode(SaveMode.Overwrite).partitionBy("ingest_batch")
          .parquet(tableDir)
        spark.read.parquet(tableDir)
          .filter(col("ingest_batch") === tag).count()
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

  /** Keyed UPSERT into a JDBC table — the SINK half of the relational
    * story (Spark's own jdbc writer only appends/overwrites; a
    * reference-data master publishes by KEY). Rows with existing keys
    * update the non-key columns; new keys insert. The shape is
    * batched UPDATE-then-INSERT (per chunk: one UPDATE executeBatch,
    * the 0-count misses re-batched as INSERTs) — the one upsert idiom
    * every JDBC dialect supports; MERGE with a VALUES source is not
    * portable (Derby, for one, rejects a non-base-table source).
    *
    * Exactly-once BY VALUE under retries: the write is convergent
    * (re-upserting the same rows lands the same state — the replay
    * just takes the UPDATE path), and rows are `repartition`-ed on
    * the key columns first so any one key is written by exactly ONE
    * task — no cross-task write race on a key, which is what makes
    * the per-partition transaction safe to retry at any granularity.
    * Per partition: one connection, one transaction, `batchSize`-row
    * chunks — executor-side parallel publish, nothing single-streams
    * through the driver. Input must be unique per key (the standard
    * upsert contract; dedupe upstream — a doubled key in one chunk
    * would race its own insert).
    *
    * @return rows written (update + insert paths)
    */
  /** Which rows of an UPDATE batch must fall through to INSERT.
    * Count 0 = definite miss. Drivers may return
    * `Statement.SUCCESS_NO_INFO` (−2) for batched statements (Oracle,
    * MySQL with rewriteBatchedStatements) — an unknown count is NOT an
    * update hit, so those rows are re-probed with a per-row
    * `executeUpdate` (exact count, convergent to re-run) and miss only
    * when the probe touches 0 rows. Without this, every row on such a
    * dialect looks "updated" and new keys are silently never inserted.
    * `Statement.EXECUTE_FAILED` (−3, drivers that report per-row
    * failures without throwing) is a FAILED update, not an unknown
    * one — re-probing would mask it as a fresh insert, so it throws.
    */
  private[graft] def insertCandidates(
      chunk: Seq[org.apache.spark.sql.Row], counts: Array[Int])(
      reprobe: org.apache.spark.sql.Row => Int)
      : Seq[org.apache.spark.sql.Row] =
    chunk.iterator.zip(counts.iterator).collect {
      case (r, 0) => Some(r)
      case (r, java.sql.Statement.SUCCESS_NO_INFO) =>
        if (reprobe(r) == 0) Some(r) else None
      case (r, c) if c < 0 =>
        throw new java.sql.SQLException(
          s"batched UPDATE reported per-row failure (count=$c) for key row " +
            s"$r — refusing to convert a failed update into an insert")
    }.flatten.toSeq

  def upsertWrite(df: DataFrame, url: String, table: String,
                  keyCols: Seq[String], batchSize: Int = 500): Long = {
    val schema = df.schema
    val cols = schema.fields.map(_.name).toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be columns of $cols")
    val dataCols = cols.filterNot(keyCols.contains)
    require(dataCols.nonEmpty, "upsertWrite needs at least one non-key column")
    val updateSql =
      s"""UPDATE $table SET ${dataCols.map(c => s"$c = ?").mkString(", ")}
         | WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}""".stripMargin
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
        s"(${cols.map(_ => "?").mkString(", ")})"
    val dataIdx = dataCols.map(schema.fieldIndex).toArray
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val allIdx = cols.map(schema.fieldIndex).toArray
    val keyed = df.repartition(keyCols.map(col): _*)
    val written = keyed.sparkSession.sparkContext.longAccumulator("upserted")
    keyed.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          rows.grouped(batchSize).foreach { chunk =>
            chunk.foreach { r =>
              var i = 0
              dataIdx.foreach { d => upd.setObject(i + 1, r.get(d)); i += 1 }
              keyIdx.foreach { k => upd.setObject(i + 1, r.get(k)); i += 1 }
              upd.addBatch()
            }
            val counts = upd.executeBatch()
            val misses = insertCandidates(chunk, counts) { r =>
              var i = 0
              dataIdx.foreach { d => upd.setObject(i + 1, r.get(d)); i += 1 }
              keyIdx.foreach { k => upd.setObject(i + 1, r.get(k)); i += 1 }
              upd.executeUpdate()
            }
            misses.foreach { r =>
              allIdx.zipWithIndex.foreach { case (c, i) =>
                ins.setObject(i + 1, r.get(c))
              }
              ins.addBatch()
            }
            if (misses.nonEmpty) ins.executeBatch()
            written.add(chunk.size.toLong)
          }
          conn.commit()
          upd.close(); ins.close()
        } finally conn.close()
      }
    }
    written.value
  }
}
