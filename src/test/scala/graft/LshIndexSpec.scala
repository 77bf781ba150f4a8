package graft

import graft.operators.{Ann, LshIndex}
import org.apache.spark.sql.functions._

/** The persisted hyperplane-LSH index lifecycle ([[AnnIndex]] parity,
  * the r14 verdict's carried ask): a probe of the corpus it was built
  * from must reproduce the per-query [[Ann.lshTopK]] at q36's 16×4
  * geometry EXACTLY; reopening after a "restart" (fresh handle,
  * persisted MODEL + signatures only) serves the same answers; delta
  * ingestion is visible, idempotent under replay, and compaction
  * (bounded retention) holds across versions.
  */
class LshIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("build-once probe-many reproduces the per-query LSH path at q36 geometry, survives restart + ingest + compaction") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString

    // build + probe == the per-query operator at q36's geometry,
    // bit-equal (same planes, same candidate join, same rerank)
    val idx = LshIndex.build(emb, dir, tables = 16, bits = 4)
    val perQuery = Ann.lshTopK(queries, emb, k = 3, tables = 16, bits = 4)
    val probed = idx.probe(queries, k = 3)
    assert(probed.count() > 0)
    assert(probed.exceptAll(perQuery).isEmpty &&
      perQuery.exceptAll(probed).isEmpty)

    // restart: a FRESH handle from disk (no captured state) agrees —
    // planes round-trip bit-exactly through the MODEL artifact
    val reopened = LshIndex.open(spark, dir)
    assert(reopened.planes == idx.planes)
    val probed2 = reopened.probe(queries, k = 3)
    assert(probed2.exceptAll(perQuery).isEmpty &&
      perQuery.exceptAll(probed2).isEmpty)

    // ingest: clone a known corpus vector under a fresh id — the new
    // row lands in the donor's buckets in every table, so it must
    // surface as a cos=1.0 neighbor without any rebuild
    val donorId = 7L
    val maxId = emb.agg(max($"vec_id")).first().getLong(0)
    val cloneId = maxId + 1L
    val delta = emb.filter($"vec_id" === donorId)
      .select(lit(cloneId).as("vec_id"), $"embedding")
    assert(reopened.ingest(2L, delta))
    assert(!reopened.ingest(2L, delta)) // at-least-once replay: no-op
    val after = reopened.probe(queries.filter($"vec_id" === donorId), k = 3)
      .filter($"neighbor_id" === cloneId)
    assert(after.count() == 1)
    assert(after.select($"cos_sim").first().getDouble(0) == 1.0)

    // compaction: retention bounds the servable set (keepVersions = 2)
    assert(reopened.ingest(3L, delta.select(($"vec_id" + 1L).as("vec_id"),
      $"embedding")))
    assert(reopened.versions == Seq(2L, 3L), reopened.versions)

    // restart again after compaction: still serves, still fresh
    val third = LshIndex.open(spark, dir)
    assert(third.probe(queries.filter($"vec_id" === donorId), k = 3)
      .filter($"neighbor_id" === cloneId).count() == 1)
  }
}
