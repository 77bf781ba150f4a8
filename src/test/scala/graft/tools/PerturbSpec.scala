package graft.tools

import org.apache.spark.sql.functions._

/** Degeneracy bounds of the organic per-copy perturbation: the
  * cross-copy structure-breaking guarantees must hold at LARGE
  * replication factors, not just the ×3 the ScaleUpSpec derivation
  * exercises — a single-letter p_name tag repeats every 26 copies and
  * an embedding shift of `copy % width` is the identity whenever the
  * copy index is a multiple of the width, both of which silently bring
  * back the quadratic cross-copy duplicate structure the perturbation
  * exists to kill.
  */
class PerturbSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("p_name tags: distinct across 200 copies AND pairwise outside the matcher band") {
    val base = Seq("widget").toDF("p_name")
    val tags = (1 to 200).map { c =>
      base.select(ScaleUp.perturbed("part", "p_name", c).get.as("n"))
        .as[String].head()
    }
    assert(tags.distinct.size == 200,
      s"only ${tags.distinct.size} distinct tags over 200 copies")
    assert(tags.forall(_ != "widget"))
    // every CROSS-COPY pair (not just adjacent) must sit outside the
    // maxDist=3 edit-distance matcher band — the invariant ScaleUpSpec
    // checks at ×3 must survive the 26-copy wrap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sample = tags.take(60)
    val minD = (for {
      i <- sample.indices; j <- sample.indices if i < j
    } yield lev(sample(i), sample(j))).min
    assert(minD > 3, s"min cross-copy tag distance $minD is inside the band")
  }

  test("embedding shift is never the identity, incl. copy = k × width") {
    val width = 8
    val vec = (1 to width).map(_.toDouble)
    val base = Seq(Tuple1(vec)).toDF("embedding")
    for (c <- Seq(1, 7, 8, 9, 16, 64, 65)) {
      val out = base
        .select(ScaleUp.perturbed("embeddings", "embedding", c).get.as("e"))
        .as[Seq[Double]].head()
      assert(out.sorted == vec.sorted, s"copy $c must permute, not alter")
      assert(out != vec,
        s"copy $c (width $width) degenerated to the identity shift")
    }
  }

  test("width-1 embeddings pass through unchanged (no mod-zero NULL)") {
    // a 1-wide vector has no non-identity rotation; the shift formula's
    // `% (width - 1)` would be a NULL-producing mod-zero — the guard
    // must return the vector verbatim, never null it out
    val base = Seq(Tuple1(Seq(42.0)), Tuple1(null.asInstanceOf[Seq[Double]]))
      .toDF("embedding")
    for (c <- Seq(1, 2, 10)) {
      val out = base
        .select(ScaleUp.perturbed("embeddings", "embedding", c).get.as("e"))
        .as[Seq[Double]].collect()
      assert(out(0) == Seq(42.0), s"copy $c corrupted a width-1 vector: ${out(0)}")
      assert(out(1) == null, s"copy $c must keep NULL embeddings NULL")
    }
  }
}
