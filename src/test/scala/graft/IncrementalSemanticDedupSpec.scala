package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalSemanticDedup, Similarity}

/** Cross-run incremental semantic dedup: the generation-append embedding
  * index must equal from-scratch semanticClusters on the union corpus while
  * computing bucket signatures for each increment's NEW distinct vectors
  * only (reference discipline: artifacts/planning.py:40 rebuild-only-stale).
  */
class IncrementalSemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private val P = IncrementalSemanticDedup.Params(planes = 4, dim = 4,
    threshold = 0.95)

  // near-dup pairs (1,2) and duplicates across runs; 5 is orthogonal
  private def vec(xs: Double*): Seq[Double] = xs
  private val base = Seq(
    (1L, vec(1.0, 0.01, 0.0, 0.0)),
    (2L, vec(1.0, 0.02, 0.0, 0.0)),
    (5L, vec(0.0, 0.0, 1.0, 0.0)))
    .toDF("vec_id", "embedding")
  private val inc = Seq(
    (10L, vec(1.0, 0.01, 0.0, 0.0)), // exact re-crawl of vector 1
    (11L, vec(0.0, 0.0, 0.0, 1.0))) // genuinely new direction
    .toDF("vec_id", "embedding")

  test("second run computes bucket signatures for the increment's new vectors only") {
    val idx = Files.createTempDirectory("graft_sem_index")
    val r1 = IncrementalSemanticDedup.update(spark, idx, base, "embedding",
      "vec_id", "crawl-1", P)
    assert(!r1.skipped && r1.gen == 1 && r1.newVectors == 3)
    val gen1Files = Files.list(idx.resolve("vectors").resolve("gen=1"))
      .toArray.map(_.toString).sorted.toSeq
    val gen1Mtimes = gen1Files.map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(f)).toMillis)

    val r2 = IncrementalSemanticDedup.update(spark, idx, inc, "embedding",
      "vec_id", "crawl-2", P)
    assert(!r2.skipped && r2.gen == 2, "second run appends a generation")
    // vector 10 is an exact re-crawl of vector 1: membership row, no
    // signature — only vector 11's genuinely new value buckets
    assert(r2.newVectors == 1,
      "run 2 must bucket the increment's NEW distinct vectors only")
    val gen1After = Files.list(idx.resolve("vectors").resolve("gen=1"))
      .toArray.map(_.toString).sorted.toSeq
    assert(gen1After == gen1Files && gen1After.map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(f)).toMillis) == gen1Mtimes,
      "run 2 must not rewrite run 1's stored vectors")
    assert(spark.read.parquet(idx.resolve("members").resolve("gen=2")
      .toString).count() == 2)

    // increment+index equals from-scratch semanticClusters on the union
    val viaIndex = IncrementalSemanticDedup.clusters(spark, idx)
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    val scratch = Similarity.semanticClusters(base.unionByName(inc),
      "vec_id", "embedding", planes = P.planes, dim = P.dim,
      threshold = P.threshold)
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    assert(viaIndex == scratch)
    // the cross-run duplicate landed in vector 1's cluster
    assert(viaIndex.exists(r => r(0) == 10L && r(1) == 1L))

    // idempotent replay: a committed generation key is a no-op
    val r3 = IncrementalSemanticDedup.update(spark, idx, inc, "embedding",
      "vec_id", "crawl-2", P)
    assert(r3.skipped && r3.gen == 2 && r3.newVectors == 0)
    // parameter drift fails loudly: bucket keys under different hyperplanes
    // are incomparable
    val e = intercept[IllegalArgumentException] {
      IncrementalSemanticDedup.update(spark, idx, inc, "embedding",
        "vec_id", "crawl-3", P.copy(planes = 8))
    }
    assert(e.getMessage.contains("incomparable"))
  }

  test("a later generation's smaller id becomes the cluster label") {
    val idx = Files.createTempDirectory("graft_sem_relabel")
    val first = Seq((20L, vec(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val second = Seq((3L, vec(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    IncrementalSemanticDedup.update(spark, idx, first, "embedding", "vec_id",
      "a", P)
    IncrementalSemanticDedup.update(spark, idx, second, "embedding", "vec_id",
      "b", P)
    val got = IncrementalSemanticDedup.clusters(spark, idx)
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    // labeling recomputes min over MEMBERS, not stored reps: 3 < 20
    assert(got == Set(Seq(20L, 3L, 2L, false), Seq(3L, 3L, 2L, true)))
  }

  test("identical zero vectors stay separate singletons and never enter the rep map") {
    val idx = Files.createTempDirectory("graft_sem_zero")
    val zeros = Seq((1L, vec(0.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val r1 = IncrementalSemanticDedup.update(spark, idx, zeros, "embedding",
      "vec_id", "z1", P)
    assert(r1.newVectors == 0, "zero vectors must not bucket")
    assert(spark.read.parquet(idx.resolve("reps").resolve("gen=1").toString)
      .count() == 0, "zero vectors must not enter the rep map")
    // a later identical zero vector is still its own singleton
    val more = Seq((3L, vec(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    IncrementalSemanticDedup.update(spark, idx, more, "embedding", "vec_id",
      "z2", P)
    val got = IncrementalSemanticDedup.clusters(spark, idx)
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 1L, 1L, true), Seq(2L, 2L, 1L, true),
      Seq(3L, 3L, 1L, true)))
    // matches the from-scratch path's zero-vector posture
    val scratch = Similarity.semanticClusters(zeros.unionByName(more),
      "vec_id", "embedding", planes = P.planes, dim = P.dim,
      threshold = P.threshold)
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    assert(got == scratch)
  }
}
