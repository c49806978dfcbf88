package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Cross-run incremental near-dup dedup — the reference's rebuild-only-stale
  * artifact discipline (artifacts/planning.py:40, artifacts/executor.py
  * run_build_if_needed) applied to a minhash signature index. A real
  * training pipeline dedups each new crawl INCREMENT against the existing
  * corpus without recomputing the corpus's signatures; this module persists
  * the per-doc minhash state as a generation-append index:
  *
  * {{{
  * indexDir/
  *   signatures/gen=N/   (id, sh, sig) for generation N's docs ONLY
  *   edges/gen=N/        verified near-dup pairs contributed by gen N
  *                       (within-increment ∪ increment-×-stored)
  *   meta.json           params + committed generations — written LAST,
  *                       atomically, so a crashed update is invisible
  * }}}
  *
  * [[update]] computes signatures for the increment alone (the stored
  * generations are READ, never recomputed or rewritten — the property
  * ArtifactGraphSpec pins), bucket-joins the increment's band keys against
  * the stored index for cross-run candidates, verifies exact Jaccard on
  * candidates only, and appends one generation. Updates are idempotent by
  * generation key: re-submitting a committed key is a no-op (the freshness
  * check of the artifact story).
  *
  * [[clusters]] equals from-scratch [[Dedup.dupClusters]] on the union
  * corpus BY CONSTRUCTION: band buckets are per-doc (independent of which
  * run computed them), so stored-gen edges ∪ increment edges is exactly the
  * union corpus's verified candidate-pair set, and the same
  * connected-components + min-id labeling runs over it.
  *
  * Scale posture: the index is O(corpus) parquet — the standard cost of
  * incremental dedup — and an update's work is O(increment signatures +
  * bucket collisions against the index), never O(corpus). The CC label pass
  * reruns over the union edge set, which is candidate-graph-sized, not
  * corpus-sized; signature computation (the dominant cost) is strictly
  * incremental.
  */
object IncrementalDedup {

  final case class Params(shingleSize: Int = 3, numPerm: Int = 64,
                          bands: Int = 16, threshold: Double = 0.5)

  final case class Generation(gen: Int, key: String, nDocs: Long)

  final case class Meta(idCol: String, textCol: String, params: Params,
                        gens: Seq[Generation])

  final case class UpdateReport(gen: Int, newSignatures: Long,
                                newEdges: Long, skipped: Boolean)

  private def metaFile(indexDir: Path): Path = indexDir.resolve("meta.json")
  private def sigDir(indexDir: Path, gen: Int): Path =
    indexDir.resolve("signatures").resolve(s"gen=$gen")
  private def edgeDir(indexDir: Path, gen: Int): Path =
    indexDir.resolve("edges").resolve(s"gen=$gen")

  // ---------------------------------------------------------------- meta io

  private def saveMeta(indexDir: Path, m: Meta): Unit = {
    import graft.sources.Runs.jsonStr
    val gens = m.gens.sortBy(_.gen).map { g =>
      s"""{"gen": ${g.gen}, "key": ${jsonStr(g.key)}, "n_docs": ${g.nDocs}}"""
    }.mkString("[", ", ", "]")
    val json =
      s"""{"version": 1, "id_col": ${jsonStr(m.idCol)},
         | "text_col": ${jsonStr(m.textCol)},
         | "shingle_size": ${m.params.shingleSize},
         | "num_perm": ${m.params.numPerm}, "bands": ${m.params.bands},
         | "threshold": ${m.params.threshold}, "gens": $gens}""".stripMargin
    Files.createDirectories(indexDir)
    val tmp = metaFile(indexDir).resolveSibling(
      s".meta-${java.util.UUID.randomUUID().toString.take(8)}.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, metaFile(indexDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def loadMeta(indexDir: Path): Option[Meta] = {
    if (!Files.exists(metaFile(indexDir))) return None
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(metaFile(indexDir)))
    import scala.jdk.CollectionConverters._
    val gens = tree.get("gens").elements().asScala.map { g =>
      Generation(g.get("gen").asInt(), g.get("key").asText(),
        g.get("n_docs").asLong())
    }.toSeq
    Some(Meta(tree.get("id_col").asText(), tree.get("text_col").asText(),
      Params(tree.get("shingle_size").asInt(), tree.get("num_perm").asInt(),
        tree.get("bands").asInt(), tree.get("threshold").asDouble()), gens))
  }

  // ---------------------------------------------------------------- update

  /** Ingest one increment under `genKey`. Stored generations are read-only
    * inputs; only the increment's signatures are computed. Re-submitting a
    * committed key skips all work (idempotent replay).
    */
  def update(spark: SparkSession, indexDir: Path, increment: DataFrame,
             textCol: String, idCol: String, genKey: String,
             params: Params = Params()): UpdateReport =
    graft.sources.Hygiene.withFileLock(
      indexDir.resolve("_system").resolve("index.lock"),
      s"Another graft dedup-index update is using '$indexDir'.") {
      updateLocked(spark, indexDir, increment, textCol, idCol, genKey, params)
    }

  private def updateLocked(spark: SparkSession, indexDir: Path,
                           increment: DataFrame, textCol: String,
                           idCol: String, genKey: String,
                           params: Params): UpdateReport = {
    val meta = loadMeta(indexDir)
    meta.foreach { m =>
      require(m.params == params && m.idCol == idCol && m.textCol == textCol,
        s"dedup index '$indexDir' was built with ${m.params} over " +
          s"(${m.idCol}, ${m.textCol}); refusing to mix with $params over " +
          s"($idCol, $textCol) — signatures would be incomparable")
    }
    meta.flatMap(_.gens.find(_.key == genKey)) match {
      case Some(g) => UpdateReport(g.gen, 0L, 0L, skipped = true)
      case None    => ingest(spark, indexDir, increment, textCol, idCol,
        genKey, params, meta)
    }
  }

  private def ingest(spark: SparkSession, indexDir: Path,
                     increment: DataFrame, textCol: String, idCol: String,
                     genKey: String, params: Params,
                     meta: Option[Meta]): UpdateReport = {
    val gen = meta.map(_.gens.map(_.gen).max + 1).getOrElse(1)
    val rows = params.numPerm / params.bands

    // the increment's signatures — the ONLY signature computation this
    // update runs — written first (invisible until the meta commit), then
    // read back so candidates and verification reuse the stored bytes
    Dedup.signedShingles(increment, textCol, idCol,
      params.shingleSize, params.numPerm)
      .write.mode("overwrite").parquet(sigDir(indexDir, gen).toString)
    val mySigs = spark.read.parquet(sigDir(indexDir, gen).toString)
    val nNew = mySigs.count()

    val foldFn = graft.functions.BandFold.register(spark, params.bands, rows,
      Dedup.BandFoldPrime)
    def banded(f: DataFrame, as: String): DataFrame =
      f.select(col(idCol).as(as),
        posexplode(call_function(foldFn, col("sig")))
          .as(Seq("band", "band_hash")))

    // within-increment candidates (id_a < id_b, the dupClusters norm) plus
    // cross-run candidates: increment band keys bucket-join the STORED
    // index — degree bounded by bucket size, corpus never re-signed
    val within = Dedup.minhashCandidates(mySigs.select(col(idCol), col("sig")),
      idCol, "sig", params.bands, rows)
    val storedGens = meta.map(_.gens.map(_.gen)).getOrElse(Nil)
    val stored = storedGens match {
      case Nil  => None
      case gens => Some(spark.read.parquet(
        gens.map(g => sigDir(indexDir, g).toString): _*))
    }
    val cands = stored match {
      case None => within
      case Some(st) =>
        val cross = banded(mySigs, "__id_new")
          .join(banded(st, "__id_old"), Seq("band", "band_hash"))
          .select(least(col("__id_new"), col("__id_old")).as("id_a"),
            greatest(col("__id_new"), col("__id_old")).as("id_b"))
          .distinct()
        within.unionByName(cross)
    }

    // exact-Jaccard verify on candidates only, shingle sets served from the
    // index (stored gens + the new one)
    val allSigs = stored.fold(mySigs)(_.unionByName(mySigs))
    val edges = cands
      .join(allSigs.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(allSigs.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .where(Text.jaccard(col("sh_a"), col("sh_b")) >= params.threshold)
      .select(col("id_a"), col("id_b"))
    edges.write.mode("overwrite").parquet(edgeDir(indexDir, gen).toString)
    val nEdges = spark.read.parquet(edgeDir(indexDir, gen).toString).count()

    saveMeta(indexDir, Meta(idCol, textCol, params,
      meta.map(_.gens).getOrElse(Nil) :+ Generation(gen, genKey, nNew)))
    UpdateReport(gen, nNew, nEdges, skipped = false)
  }

  // --------------------------------------------------------------- clusters

  /** Duplicate clusters over EVERYTHING the index has ingested — equal to
    * [[Dedup.dupClusters]] run from scratch on the union corpus: same
    * candidate set (band buckets are per-doc), same verified edges, same
    * min-id connected-components labeling.
    */
  def clusters(spark: SparkSession, indexDir: Path): DataFrame = {
    val m = loadMeta(indexDir).getOrElse(throw new IllegalArgumentException(
      s"dedup index '$indexDir' has no committed generations"))
    val gens = m.gens.map(_.gen)
    val nodes = spark.read
      .parquet(gens.map(g => sigDir(indexDir, g).toString): _*)
      .select(col(m.idCol))
    val edges = spark.read
      .parquet(gens.map(g => edgeDir(indexDir, g).toString): _*)
    val labels = Dedup.connectedComponents(nodes, edges, m.idCol)
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    labels
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("is_canonical", col(m.idCol) === col("cluster_id"))
  }
}
