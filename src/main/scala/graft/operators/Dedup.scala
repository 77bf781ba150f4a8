package graft.operators

import graft.functions.{SimHash, Text, TextExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline: exact,
  * MinHash-LSH, SimHash, and n-gram Jaccard near-dup detection.
  *
  * Scale design: nothing here is O(n²). Signatures (MinHash, SimHash,
  * shingle sets) are computed row-local with zero shuffle — the only
  * shuffles are the equality joins on band/chunk/gram keys, each linear
  * in data size. Hot keys are bounded by construction (bands are
  * hashes; n-gram join applies a document-frequency cap, the standard
  * prefix-filter trick) so no LSH bucket degenerates into a quadratic
  * blowup at 100 TB.
  */
object Dedup {

  /** Exact dedup by content hash: canonical id + multiplicity per
    * distinct text. Map-side partial agg makes the shuffle O(distinct).
    */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH banding (Broder; see MMDS ch.3).
    *
    * k minhashes over word-`shingleSize`-gram sets, computed per-row as
    * `array_min(transform(shingles, xxhash64(seed_i, _)))` — no
    * explode/groupBy, so signature generation is shuffle-free. The k
    * signature slots are split into `bands`; documents agreeing on any
    * band hash become candidate pairs via a self-equi-join on
    * (band_idx, band_hash). Pair similarity is then estimated from
    * full-signature agreement.
    *
    * @param threshold minimum estimated Jaccard to report
    */
  def minHashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", k: Int = 32, bands: Int = 8,
                   shingleSize: Int = 3, threshold: Double = 0.1): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    val withSig = docs.select(col(idCol).as("id"),
      TextExpressions.minhashSig(col(textCol), k, shingleSize).as("sig"))
    val bandCols = (0 until bands).map(b => xxhash64(slice(col("sig"), b * r + 1, r)))
    val entries = withSig
      .select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val a = entries.select(col("band_idx"), col("band_hash"),
      col("id").as("doc_a"), col("sig").as("sig_a"))
    val b = entries.select(col("band_idx"), col("band_hash"),
      col("id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k).as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(max(col("est_jaccard")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash (custom Catalyst expression,
    * see [[graft.functions.SimHash64]]), banded into four 16-bit chunks.
    * Two docs within hamming distance 3 of each other must agree on at
    * least one chunk (pigeonhole), so the chunk equi-join finds all such
    * pairs without a quadratic scan; `maxHamming` then verifies exactly
    * via bit_count(xor).
    */
  def simHashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxHamming: Int = 16): DataFrame = {
    val sim = SimHash.simhash64(Text.tokens(col(textCol)))
    val withSim = docs.select(col(idCol).as("id"), sim.as("sim"))
    val chunkCols = (0 until 4).map(c =>
      shiftrightunsigned(col("sim"), 16 * c).bitwiseAND(lit(0xFFFFL)))
    val entries = withSim
      .select(col("id"), col("sim"), posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = entries.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("doc_a"), col("sim").as("sim_a"))
    val b = entries.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity over candidate pairs from a
    * shared-gram inverted index. Grams with document frequency above
    * `maxDf` are dropped before the self-join (prefix filtering): at
    * scale a stop-gram shared by 10% of the corpus would otherwise
    * produce a quadratic candidate set while contributing nothing to
    * near-dup discrimination.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 2,
                        maxDf: Int = 50, threshold: Double = 0.2): DataFrame = {
    val grams = TextExpressions.shingleSet(col(textCol), n)
    val exploded = docs
      .select(col(idCol).as("id"), explode(grams).as("gram"), size(grams).as("n_grams"))
    val rare = exploded.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select(col("gram"))
    val filtered = exploded.join(rare, Seq("gram"), "left_semi")
    val a = filtered.select(col("gram"), col("id").as("doc_a"), col("n_grams").as("n_a"))
    val b = filtered.select(col("gram"), col("id").as("doc_b"), col("n_grams").as("n_b"))
    a.join(b, Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
