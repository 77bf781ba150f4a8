package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data derivation: replicates an sf directory N× with
  * key-shifted copies so the engine can be driven at scales no
  * generated testdata exists for (`ScaleUp <srcDir> <dstDir> <factor>`).
  *
  * Every surrogate key column is shifted by `copy × (max+1)` so joins,
  * dedup and rank keys keep their cardinality structure (10× rows →
  * 10× orders/users/docs, NOT 10 duplicates of each key), while
  * low-cardinality columns (event_type, source, dims) stay
  * low-cardinality — exactly the property the skew/limit guards are
  * supposed to survive. Dimension tables (region, nation) are fixed,
  * as in TPC-H scaling. Timestamps are left alone: more rows in the
  * same span models higher feed volume.
  *
  * Payload columns are perturbed ORGANICALLY per copy (copy 0 stays
  * verbatim), because verbatim replication made every near-dup /
  * name-match output quadratic in the replication factor — the scale
  * gate was partly measuring the generator, not the engine:
  *  - `documents.text`: every token gets a per-copy suffix, so WITHIN
  *    a copy all pairwise shingle Jaccards equal the source's (both
  *    members shift identically) while ACROSS copies token/shingle
  *    overlap is zero — the near-dup structure replicates linearly
  *    (n_chars is recomputed to stay = length(text));
  *  - `part.p_name`: a 6-char per-copy tag keeps within-copy edit
  *    distances unchanged and pushes cross-copy distances past every
  *    matcher threshold;
  *  - `embeddings.embedding`: a per-copy CIRCULAR SHIFT of the
  *    dimensions — an orthogonal transform, so norms and all
  *    within-copy dot products/cosines are preserved exactly, while
  *    cross-copy cosine collapses to the background level.
  * Correctness gates still compare both engines on the SAME derived
  * input, so perturbation cannot bias the comparison.
  */
object ScaleUp {

  // long key columns shifted per copy, per table
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )
  private val fixedDims = Seq("region", "nation")

  /** Per-copy payload perturbation (None = copy verbatim). Copy 0 is
    * always verbatim so the source's own near-dup structure survives
    * exactly once. See the object doc for the invariants each branch
    * preserves.
    */
  private[tools] def perturbed(table: String, column: String,
                               copy: Int): Option[org.apache.spark.sql.Column] =
    if (copy == 0) None
    else (table, column) match {
      case ("documents", "text") =>
        // suffix every non-empty token; null/empty text stays itself
        val tagged = concat_ws(" ",
          transform(split(col("text"), "\\s+"),
            t => when(length(t) === 0, t)
              .otherwise(concat(t, lit(s"_c$copy")))))
        Some(when(col("text").isNull, col("text")).otherwise(tagged))
      case ("documents", "n_chars") =>
        Some(when(col("text").isNull, col("n_chars"))
          .otherwise(length(perturbed(table, "text", copy).get)
            .cast("long")))
      case ("part", "p_name") =>
        // 3 base-26 digits of the FULL copy index, each repeated 4× —
        // unique for any factor < 26³ (a single-letter tag repeats
        // every 26 copies, quietly bringing back the cross-copy
        // duplicate structure organic perturbation exists to kill),
        // and two DISTINCT tags differ in ≥ 4 positions, keeping every
        // cross-copy pair outside the maxDist=3 matcher band
        require(copy < 26 * 26 * 26,
          s"p_name tag space exhausted at copy $copy (max ${26 * 26 * 26})")
        val tag = {
          val sb = new StringBuilder; var c = copy
          var d = 0
          while (d < 3) {
            val ch = ('a' + (c % 26)).toChar
            var r = 0; while (r < 4) { sb.append(ch); r += 1 }
            c /= 26; d += 1
          }
          sb.toString
        }
        Some(concat(col("p_name"), lit(s" $tag")))
      case ("embeddings", "embedding") =>
        // circular dimension shift by ((copy-1) mod (width-1)) + 1:
        // always in [1, width-1], so the shift is NEVER the identity
        // (copy % width == 0 would reproduce the source vector
        // verbatim at large factors)
        // width-1 vectors have no non-identity rotation AND would make
        // `% (sz-1)` a NULL-producing mod-zero — pass them through
        val sz = size(col("embedding"))
        val k = (lit(copy - 1) % (sz - 1)) + 1
        Some(when(col("embedding").isNull || sz <= 1, col("embedding"))
          .otherwise(
            concat(slice(col("embedding"), k + 1, sz - k),
              slice(col("embedding"), lit(1), k))))
      case _ => None
    }

  def scaleTable(spark: SparkSession, src: String, dst: String,
                 table: String, factor: Int): Unit = {
    // read through the library's loaders: events goes through the
    // footer-branched read plan (Tables.events), so both NANOS-era and
    // MICROS-era source dirs derive correctly; the derived copy is
    // written back as standard TimestampType µs, which the same loader
    // consumes natively on re-read
    val df =
      if (table == "events") graft.Tables.events(spark, src)
      else graft.Tables.load(spark, src, table)
    val scaled =
      if (fixedDims.contains(table) || factor <= 1) df
      else {
        val keys = shiftCols(table)
        val offs = df.agg(max(col(keys.head)),
            keys.tail.map(k => max(col(k))): _*)
          .collect()(0)
        val offsets = keys.indices.map(i => offs.getLong(i) + 1L)
        (0 until factor).map { c =>
          df.select(df.columns.map { cn =>
            val ki = keys.indexOf(cn)
            if (ki >= 0 && c > 0) (col(cn) + lit(c * offsets(ki))).as(cn)
            else perturbed(table, cn, c).map(_.as(cn)).getOrElse(col(cn))
          }.toIndexedSeq: _*)
        }.reduce(_.unionByName(_))
      }
    // Derived fixtures STORE the multimodal binary column: the payload
    // is synthesized from the FINAL (shifted id, perturbed text) pair
    // with the same shared expression the loader's fallback attaches,
    // so stored and synthesized-at-read bytes are identical by
    // construction — and the scaled corpus carries real container
    // payloads in parquet, which the r15 base fixtures (read-only)
    // cannot. Recomputed per copy from the final columns, never copied
    // from the source, so a source dir with a stale payload column
    // cannot leak wrong bytes forward (it is dropped first).
    val out =
      if (table == "documents")
        scaled.drop("payload").withColumn("payload",
          graft.operators.Multimodal.containerPayload(
            col("doc_id"), col("text")))
      else scaled
    out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(src, dst, f) = args
    val factor = f.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = fixedDims ++ shiftCols.keys
    tables.foreach { t =>
      scaleTable(spark, src, dst, t, factor)
      println(s"[scaleup] $t done")
    }
    spark.stop()
  }
}
