package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / probe-many lifecycle the
  * per-query [[Ann.ivfTopK]] deliberately does not have (q36/q44
  * re-derive their structures per query; fine for one query, wasteful
  * for an index probed thousands of times a day at 100 TB).
  *
  * Layout under `dir`:
  *  - `MODEL` — the coarse quantizer as a flat text artifact (header +
  *    one line of `java.lang.Double.toString` values per centroid —
  *    bit-exact round trip, no parser dependency). Written once at
  *    [[AnnIndex.build]]; probe sessions NEVER re-derive it, which is
  *    what makes delta ingestion sound (a re-derived quantizer would
  *    silently re-cell the whole corpus).
  *  - `cells/` — a [[graft.sources.VersionedTable]] of
  *    (vec_id, embedding, cell): atomic pointer swaps, idempotent
  *    versioned commits (at-least-once ingest replays are no-ops),
  *    bounded retention (compaction), crash-orphan cleanup — the s32
  *    gram-index lifecycle applied to embeddings.
  *
  * The probe path is [[Ann.ivfTopK]]'s tail verbatim on the STORED
  * cell assignments: queries learn their nProbe cells row-locally from
  * the persisted centroids, the only exchange is the candidate join on
  * cell id, and exact cosine is paid only against probed cells'
  * members. Building from the same corpus, a probe of that corpus
  * reproduces q44's output exactly — spec-pinned, as is the
  * reopen-after-restart path and ingest-then-probe freshness.
  */
object AnnIndex {

  /** Build the index at `dir`: derive the q44 coarse quantizer (first
    * `nCentroids` corpus vectors by id — the k-means seeding step),
    * persist it, and publish cell assignments as version `batchId`.
    */
  def build(corpus: DataFrame, dir: String, nCentroids: Int = 16,
            batchId: Long = 1L, idCol: String = "vec_id",
            vecCol: String = "embedding"): AnnIndex = {
    val spark = corpus.sparkSession
    val centroids: Seq[Seq[Double]] = corpus.filter(col(idCol) < nCentroids)
      .select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .collect().toSeq
      .map(_.getSeq[Number](1).map(_.doubleValue()).toSeq)
    require(centroids.nonEmpty, "no centroid rows found")
    writeModel(spark, dir, centroids)
    val idx = new AnnIndex(spark, dir, centroids)
    idx.ingest(batchId, corpus, idCol, vecCol)
    idx
  }

  /** Reopen a built index (the restart path): centroids come from the
    * persisted MODEL, assignments from the live `cells/` version —
    * nothing is re-derived.
    */
  def open(spark: SparkSession, dir: String): AnnIndex =
    new AnnIndex(spark, dir, readModel(spark, dir))

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeModel(spark: SparkSession, dir: String,
                         centroids: Seq[Seq[Double]]): Unit = {
    val sb = new StringBuilder
    sb.append(s"ivf ${centroids.size} ${centroids.head.size}\n")
    centroids.foreach { c =>
      sb.append(c.map(java.lang.Double.toString).mkString(" ")).append('\n')
    }
    val out = fs(spark, dir).create(
      new org.apache.hadoop.fs.Path(s"$dir/MODEL"), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readModel(spark: SparkSession, dir: String): Seq[Seq[Double]] = {
    val in = fs(spark, dir).open(
      new org.apache.hadoop.fs.Path(s"$dir/MODEL"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val header = lines.head.split(" ")
    require(header(0) == "ivf", s"not an IVF model: ${lines.head}")
    val (n, d) = (header(1).toInt, header(2).toInt)
    val cs = lines.tail.take(n).map(_.split(" ").toSeq.map(_.toDouble))
    require(cs.size == n && cs.forall(_.size == d),
      s"model truncated: expected $n x $d")
    cs
  }
}

class AnnIndex private[operators] (spark: SparkSession, dir: String,
                                   val centroids: Seq[Seq[Double]]) {

  private val cellsTable =
    new graft.sources.VersionedTable(spark, s"$dir/cells")

  private def cellsOf(vec: org.apache.spark.sql.Column, n: Int) =
    graft.functions.VectorExpressions.nearestCells(vec, centroids, n)

  /** Assign cells to `delta` with the PERSISTED quantizer and merge by
    * id into version `batchId` (idempotent: a replayed batchId is a
    * no-op; rows sharing an id are replaced — the upsert contract).
    */
  def ingest(batchId: Long, delta: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding"): Boolean =
    cellsTable.merge(batchId,
      delta.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        element_at(cellsOf(col(vecCol), 1), 1).as("cell")),
      Seq("vec_id"))

  /** The servable version ids (compaction keeps the retention window). */
  def versions: Seq[Long] = cellsTable.versions

  /** Probe-only top-k: q44's candidate-join tail over the STORED cell
    * assignments — no corpus pass, no quantizer derivation. Queries
    * probe their `nProbe` nearest cells and pay exact cosine against
    * those cells' members only.
    */
  def probe(queries: DataFrame, k: Int, nProbe: Int = 4,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val stored = cellsTable.current.getOrElse(
      sys.error(s"AnnIndex at $dir has no published cells version"))
    val corpusCells = stored.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_vec"), col("cell"))
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(cellsOf(col(vecCol), nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    queryCells.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw",
        graft.functions.Vectors.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"), col("rnk"))
  }
}
