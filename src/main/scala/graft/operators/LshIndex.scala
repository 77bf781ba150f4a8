package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted random-hyperplane LSH index — [[AnnIndex]]'s lifecycle
  * applied to the q36 signature tables, closing the r14 parity gap
  * (the IVF path had build-once/probe-many; the hyperplane tables
  * still rebuilt per query).
  *
  * Layout under `dir`:
  *  - `MODEL` — the hyperplane matrix as a flat text artifact (header
  *    `lsh <tables> <bits> <dim> <seed>` + one line of
  *    `java.lang.Double.toString` components per (table, bit) plane —
  *    bit-exact round trip). The planes are DERIVABLE from the seed,
  *    but they are persisted in full anyway: a future change to the
  *    plane generator would otherwise silently re-bucket a stored
  *    corpus on reopen — the same hazard [[AnnIndex]]'s persisted
  *    quantizer guards against, and why probe sessions NEVER
  *    re-derive.
  *  - `sig/` — a [[graft.sources.VersionedTable]] of
  *    (vec_id, embedding, buckets: array<long>, one bucket id per
  *    table): atomic pointer swaps, idempotent versioned commits
  *    (at-least-once ingest replays are no-ops), bounded retention.
  *    ONE row per vector — the per-table explode is row-local at
  *    probe time, so the stored artifact does not pay the `tables`×
  *    duplication the candidate join materializes transiently.
  *
  * The probe path is [[Ann.lshTopK]]'s tail verbatim on the STORED
  * signatures: queries learn their buckets row-locally from the
  * persisted planes ([[graft.functions.LshSig]] — one primitive loop
  * per row), the only exchanges are the (table_idx, bucket) candidate
  * join and the per-query top-k window, and exact cosine is paid only
  * against bucket-mates. Built from the same corpus with the same
  * geometry, a probe reproduces q36's per-query operator exactly —
  * spec-pinned, as are the reopen-after-restart path and
  * ingest-then-probe freshness.
  */
object LshIndex {

  /** Build the index at `dir`: derive the hyperplane tables (same
    * generator and default geometry as q36's 16×4 configuration),
    * persist them, and publish signatures as version `batchId`.
    * `dim = -1` derives the dimension from the corpus with one
    * LIMIT-1 scan (the [[Ann.lshTopK]] validation — a wrong dim
    * null-pads every dot product and collapses all buckets to 0).
    */
  def build(corpus: DataFrame, dir: String, tables: Int = 16,
            bits: Int = 4, dim: Int = -1, seed: Long = 42L,
            batchId: Long = 1L, idCol: String = "vec_id",
            vecCol: String = "embedding"): LshIndex = {
    val spark = corpus.sparkSession
    val d = if (dim > 0) dim
            else corpus.select(size(col(vecCol)).as("d")).first().getInt(0)
    require(d > 0, s"embedding dimension must be positive, got $d")
    val planes: Seq[Seq[Seq[Double]]] =
      Ann.hyperplanes(tables, bits, d, seed).map(_.map(_.toSeq).toSeq).toSeq
    writeModel(spark, dir, planes, d, seed)
    val idx = new LshIndex(spark, dir, planes)
    idx.ingest(batchId, corpus, idCol, vecCol)
    idx
  }

  /** Reopen a built index (the restart path): planes come from the
    * persisted MODEL, signatures from the live `sig/` version —
    * nothing is re-derived.
    */
  def open(spark: SparkSession, dir: String): LshIndex =
    new LshIndex(spark, dir, readModel(spark, dir))

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeModel(spark: SparkSession, dir: String,
                         planes: Seq[Seq[Seq[Double]]], dim: Int,
                         seed: Long): Unit = {
    val sb = new StringBuilder
    sb.append(s"lsh ${planes.size} ${planes.head.size} $dim $seed\n")
    planes.foreach(_.foreach { p =>
      sb.append(p.map(java.lang.Double.toString).mkString(" ")).append('\n')
    })
    val out = fs(spark, dir).create(
      new org.apache.hadoop.fs.Path(s"$dir/MODEL"), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readModel(spark: SparkSession,
                        dir: String): Seq[Seq[Seq[Double]]] = {
    val in = fs(spark, dir).open(
      new org.apache.hadoop.fs.Path(s"$dir/MODEL"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val header = lines.head.split(" ")
    require(header(0) == "lsh", s"not an LSH model: ${lines.head}")
    val (tables, bits, d) =
      (header(1).toInt, header(2).toInt, header(3).toInt)
    val flat = lines.tail.take(tables * bits)
      .map(_.split(" ").toSeq.map(_.toDouble))
    require(flat.size == tables * bits && flat.forall(_.size == d),
      s"model truncated: expected ${tables * bits} x $d")
    flat.grouped(bits).toSeq
  }
}

class LshIndex private[operators] (spark: SparkSession, dir: String,
                                   val planes: Seq[Seq[Seq[Double]]]) {

  private val sigTable =
    new graft.sources.VersionedTable(spark, s"$dir/sig")

  private def bucketsOf(vec: Column): Column =
    graft.functions.VectorExpressions.lshSig(vec, planes)

  /** Sign `delta` with the PERSISTED planes and merge by id into
    * version `batchId` (idempotent: a replayed batchId is a no-op;
    * rows sharing an id are replaced — the upsert contract).
    */
  def ingest(batchId: Long, delta: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding"): Boolean =
    sigTable.merge(batchId,
      delta.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        bucketsOf(col(vecCol)).as("buckets")),
      Seq("vec_id"))

  /** The servable version ids (compaction keeps the retention window). */
  def versions: Seq[Long] = sigTable.versions

  /** Probe-only top-k: q36's candidate-join tail over the STORED
    * signatures — no corpus signing, no plane derivation. Candidates
    * come from any shared (table, bucket) cell, deduped, then exact
    * cosine reranks and the per-query window keeps k.
    */
  def probe(queries: DataFrame, k: Int, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val stored = sigTable.current.getOrElse(
      sys.error(s"LshIndex at $dir has no published signature version"))
    val qb = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        posexplode(bucketsOf(col(vecCol))))
      .withColumnRenamed("pos", "table_idx")
      .withColumnRenamed("col", "bucket")
    val cb = stored
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"),
        posexplode(col("buckets")))
      .withColumnRenamed("pos", "table_idx")
      .withColumnRenamed("col", "bucket")
      .select(col("table_idx"), col("bucket"), col("neighbor_id"),
        col("c_vec"))
    val candidates = qb.join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("q_vec"), col("neighbor_id"),
        col("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    candidates
      .withColumn("cos_raw",
        graft.functions.Vectors.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"), col("rnk"))
  }
}
