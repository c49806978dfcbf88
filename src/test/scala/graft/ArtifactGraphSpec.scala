package graft

import java.io.PrintStream
import java.nio.file.{Files, Path}

import graft.pipeline.{ArtifactGraph, Config}

/** Artifact dependency graph + incremental build + hydration (reference
  * artifacts/planning.py ArtifactGraph.freshness, executor.py
  * run_build_if_needed, hydration.py): scoped fingerprints mean touching one
  * artifact's input rebuilds THAT artifact and its dependents only, serving
  * everything else from the store.
  */
class ArtifactGraphSpec extends SparkSpec {

  private val quiet = new PrintStream(java.io.OutputStream.nullOutputStream())

  /** Two sources with DISJOINT artifact scopes: stream `s` (source ev)
    * carries the dataset vectors; stream `t` (source ev2) only feeds the
    * ticks task.
    */
  private def disjointYaml: String =
    """sources:
      |  - id: ev
      |    loader: { transport: fs, path: ev/events.parquet, reader: { format: parquet } }
      |  - id: ev2
      |    loader: { transport: fs, path: ev2/events.parquet, reader: { format: parquet } }
      |streams:
      |  - id: s
      |    from: { source: ev }
      |    map: { time: ts, fields: [user_id, value] }
      |    partition_by: [user_id]
      |  - id: t
      |    from: { source: ev2 }
      |    map: { time: ts, fields: [user_id, value] }
      |    partition_by: [user_id]
      |dataset:
      |  sample: { cadence: 1h, keys: [user_id] }
      |  features: [ { id: v, stream: s, field: value, scale: true } ]
      |tasks:
      |  - { id: sc, task: scaler }
      |  - { id: meta, task: metadata }
      |  - { id: cov, task: coverage, threshold: 0.5, stage: assembled }
      |  - { id: ticks, task: ticks, stream: t, grid_by: [user_id] }
      |""".stripMargin

  /** Same shape but the ticks task rides the VECTOR stream `s`, so scaler
    * and metadata depend on it.
    */
  private def chainedYaml(gridBy: String): String =
    s"""sources:
       |  - id: ev
       |    loader: { transport: fs, path: ev/events.parquet, reader: { format: parquet } }
       |streams:
       |  - id: s
       |    from: { source: ev }
       |    map: { time: ts, fields: [user_id, value] }
       |    partition_by: [user_id]
       |dataset:
       |  sample: { cadence: 1h, keys: [user_id] }
       |  features: [ { id: v, stream: s, field: value, scale: true } ]
       |tasks:
       |  - { id: sc, task: scaler }
       |  - { id: meta, task: metadata }
       |  - { id: cov, task: coverage, threshold: 0.5, stage: assembled }
       |  - { id: ticks, task: ticks, stream: s, grid_by: [$gridBy] }
       |""".stripMargin

  private def stage(root: Path, subdirs: String*): Unit = subdirs.foreach { d =>
    val dir = root.resolve(d)
    Files.createDirectories(dir)
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
  }

  private def touch(root: Path, subdir: String): Unit = {
    val f = root.resolve(subdir).resolve("events.parquet")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 1234))
  }

  test("dependency edges mirror the reference artifact definitions") {
    val disjoint = Config.parseProject(disjointYaml)
    assert(ArtifactGraph.dependencies(disjoint) == Map(
      "sc" -> Nil, "meta" -> Nil, "cov" -> Seq("meta"), "ticks" -> Nil))

    val chained = Config.parseProject(chainedYaml("user_id"))
    val deps = ArtifactGraph.dependencies(chained)
    assert(deps("sc") == Seq("ticks"), "scaler depends on scaled-stream ticks")
    assert(deps("meta") == Seq("ticks"), "metadata depends on input-stream ticks")
    assert(deps("cov") == Seq("meta"))
    assert(ArtifactGraph.dependentsOf(deps, Set("ticks")) == Set("sc", "meta", "cov"))
    val order = ArtifactGraph.topoOrder(chained, deps)
    assert(order.indexOf("ticks") < order.indexOf("sc"))
    assert(order.indexOf("meta") < order.indexOf("cov"))
  }

  test("touching one source rebuilds only the artifacts scoped to it") {
    val root = Files.createTempDirectory("graft_artifact_graph")
    stage(root, "ev", "ev2")
    val project = Config.parseProject(disjointYaml)
    val store = root.resolve("artifacts")

    def run() = ArtifactGraph.build(spark, root.toString, project, store,
      out = quiet)

    val first = run()
    assert(first.rebuilt.toSet == Set("sc", "meta", "cov", "ticks"))
    assert(first.freshness.missing == Set("sc", "meta", "cov", "ticks"))

    val second = run()
    assert(second.rebuilt.isEmpty && second.hydrated.length == 4,
      "unchanged inputs must hydrate everything")
    // hydrated report content identical to the built one
    assert(second.reports("ticks").collect().toSet ==
      first.reports("ticks").collect().toSet)

    // touch the ticks-only source → ticks rebuilds, the rest hydrate
    touch(root, "ev2")
    val third = run()
    assert(third.rebuilt == Seq("ticks"), s"got ${third.rebuilt}")
    assert(third.hydrated.toSet == Set("sc", "meta", "cov"),
      "untouched scaler/metadata/coverage must serve from the store")
    assert(third.freshness.stale == Set("ticks"))

    // touch the vector source → dataset-stage artifacts rebuild, ticks hydrates
    touch(root, "ev")
    val fourth = run()
    assert(fourth.rebuilt.toSet == Set("sc", "meta", "cov"))
    assert(fourth.hydrated == Seq("ticks"))
  }

  test("a stale dependency propagates to its transitive dependents") {
    val root = Files.createTempDirectory("graft_artifact_chain")
    stage(root, "ev")
    val store = root.resolve("artifacts")

    val v1 = Config.parseProject(chainedYaml("user_id"))
    val first = ArtifactGraph.build(spark, root.toString, v1, store, out = quiet)
    assert(first.rebuilt.length == 4)

    // change ONLY the ticks task definition → ticks stale; scaler and
    // metadata follow (dependency hash + outdated propagation); coverage
    // follows metadata
    // dependents classify stale too: each artifact's scoped hash folds its
    // dependencies' hashes in (reference calculate_artifact_hashes), so a
    // changed ticks definition shifts scaler/metadata/coverage keys as well
    val v2 = Config.parseProject(chainedYaml(""))
    val second = ArtifactGraph.build(spark, root.toString, v2, store, out = quiet)
    assert(second.freshness.stale == Set("ticks", "sc", "meta", "cov"),
      s"${second.freshness}")
    assert(second.freshness.missing.isEmpty)
    assert(second.rebuilt.toSet == Set("ticks", "sc", "meta", "cov"),
      "dependents of a stale artifact must rebuild")
  }

  test("postprocess drift invalidates the dataset-stage artifacts, not ticks") {
    // the scaler/metadata reports run on the POSTPROCESSED frame, so the
    // row threshold belongs in their scoped hash even though the reference
    // scopes its (pre-assembly) scaler narrower
    def yaml(thr: Double): String =
      s"""sources:
         |  - id: ev
         |    loader: { transport: fs, path: ev/events.parquet, reader: { format: parquet } }
         |  - id: ev2
         |    loader: { transport: fs, path: ev2/events.parquet, reader: { format: parquet } }
         |streams:
         |  - id: s
         |    from: { source: ev }
         |    map: { time: ts, fields: [user_id, value, event_type] }
         |    partition_by: [user_id]
         |  - id: p
         |    from: { stream: s }
         |    transforms:
         |      - { operation: where, field: event_type, operator: eq, comparand: purchase }
         |  - id: t
         |    from: { source: ev2 }
         |    map: { time: ts, fields: [user_id, value] }
         |    partition_by: [user_id]
         |dataset:
         |  sample: { cadence: 1h, keys: [user_id] }
         |  features:
         |    - { id: v, stream: s, field: value, scale: true }
         |    - { id: pv, stream: p, field: value }
         |  postprocess:
         |    samples: { features: { threshold: $thr } }
         |tasks:
         |  - { id: sc, task: scaler }
         |  - { id: meta, task: metadata }
         |  - { id: ticks, task: ticks, stream: t, grid_by: [user_id] }
         |""".stripMargin
    val root = Files.createTempDirectory("graft_artifact_post")
    stage(root, "ev", "ev2")
    val store = root.resolve("artifacts")
    val first = ArtifactGraph.build(spark, root.toString,
      Config.parseProject(yaml(0.95)), store, out = quiet)
    assert(first.rebuilt.length == 3)
    // changed row threshold → scaler + metadata stale; ticks untouched
    val second = ArtifactGraph.build(spark, root.toString,
      Config.parseProject(yaml(0.5)), store, out = quiet)
    assert(second.rebuilt.toSet == Set("sc", "meta"), s"${second.rebuilt}")
    assert(second.hydrated == Seq("ticks"))

    // a NON-scaled vector's source feeds the scaler's surviving rows, so
    // touching it must invalidate the scaler too (stream p reads ev)
    touch(root, "ev")
    val third = ArtifactGraph.build(spark, root.toString,
      Config.parseProject(yaml(0.5)), store, out = quiet)
    assert(third.rebuilt.toSet == Set("sc", "meta"))
  }

  test("concurrent builds on one artifacts root fail fast instead of racing") {
    val root = Files.createTempDirectory("graft_artifact_lock")
    stage(root, "ev", "ev2")
    val project = Config.parseProject(disjointYaml)
    val store = root.resolve("artifacts")
    graft.sources.Hygiene.withFileLock(
      store.resolve("_system").resolve("artifacts.lock"), "held by test") {
      val e = intercept[graft.sources.Hygiene.ExecutionBusyException](
        ArtifactGraph.build(spark, root.toString, project, store, out = quiet))
      assert(e.getMessage.contains("artifacts root"))
    }
    // lock released → builds proceed
    assert(ArtifactGraph.build(spark, root.toString, project, store,
      out = quiet).rebuilt.length == 4)
  }

  test("a deleted report classifies missing and rebuilds alone when nothing depends on it") {
    val root = Files.createTempDirectory("graft_artifact_missing")
    stage(root, "ev", "ev2")
    val project = Config.parseProject(disjointYaml)
    val store = root.resolve("artifacts")
    ArtifactGraph.build(spark, root.toString, project, store, out = quiet)

    org.apache.commons.io.FileUtils.deleteDirectory(
      store.resolve("ticks").toFile)
    val next = ArtifactGraph.build(spark, root.toString, project, store,
      out = quiet)
    assert(next.freshness.missing == Set("ticks"))
    assert(next.rebuilt == Seq("ticks") &&
      next.hydrated.toSet == Set("sc", "meta", "cov"))
  }

  test("stats artifact: repeat counts serve from the cache, input drift misses") {
    import graft.pipeline.ArtifactCache
    val root = Files.createTempDirectory("graft_stats_cache")
    val table = root.resolve("emb.parquet")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .write.parquet(table.toString)
    val cacheDir = root.resolve("cache")
    val df = spark.read.parquet(table.toString)
    val n = ArtifactCache.cachedCount(df, cacheDir)
    assert(n == df.count())

    // prove the second call reads the artifact, not the corpus: poison the
    // stored value under the SAME fingerprint and watch it come back
    import scala.jdk.CollectionConverters._
    val entry = scala.util.Using.resource(Files.list(cacheDir.resolve("stats")))(
      _.iterator().asScala.toSeq.head)
    Files.writeString(entry, (n + 7).toString)
    assert(ArtifactCache.cachedCount(df, cacheDir) == n + 7,
      "unchanged inputs must serve the stored statistic with no scan")

    // touching a backing file changes the fingerprint → recount
    val part = scala.util.Using.resource(Files.walk(table))(
      _.iterator().asScala.find(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).get)
    Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(part).toMillis + 999))
    assert(ArtifactCache.cachedCount(spark.read.parquet(table.toString),
      cacheDir) == n, "touched input must recount")

    // frames with no input files compute uncached
    import spark.implicits._
    assert(ArtifactCache.cachedCount(Seq(1, 2, 3).toDF("x"), cacheDir) == 3)

    // two DIFFERENT frames over the same files must not share a key: a
    // filtered corpus and the full one have distinct canonicalized plans
    import org.apache.spark.sql.functions.col
    val full = spark.read.parquet(table.toString)
    val filtered = full.filter(col("vec_id") < 5)
    val nFiltered = ArtifactCache.cachedCount(filtered, cacheDir)
    assert(nFiltered == filtered.count() &&
      nFiltered != ArtifactCache.cachedCount(full, cacheDir),
      "plan shape must discriminate the cache key")
  }

  test("annIvf with a stats cache matches the uncached plan") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft_ivf_stats")
    def run(cache: Option[java.nio.file.Path]) =
      graft.operators.Similarity.annIvf(e.filter(col("vec_id") < 3), e,
        "vec_id", "embedding", k = 3, minStride = 37L, nprobe = 2,
        statsCache = cache).collect().map(_.toString).toSet
    val uncached = run(None)
    assert(run(Some(dir)) == uncached, "first (populating) pass")
    assert(run(Some(dir)) == uncached, "second (cache-served) pass")
  }

  test("materialize --artifacts prepares task artifacts before the dataset run") {
    val root = Files.createTempDirectory("graft_mat_artifacts")
    stage(root, "ev", "ev2")
    val cfg = root.resolve("p.yaml")
    Files.writeString(cfg, disjointYaml)
    val store = root.resolve("artifacts")
    val serve = root.resolve("serve").toString

    def run(): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Cli.materialize(spark, cfg.toString, root.toString, serve,
        out = new PrintStream(buf, true, "UTF-8"),
        artifactsRoot = Some(store.toString))
      buf.toString("UTF-8")
    }

    val first = run()
    assert(first.contains("artifact ticks rebuilt ["), first)
    assert(first.contains("run "), "dataset run must follow the build")
    assert(Files.exists(store.resolve("ticks").resolve("report.parquet")))

    // unchanged inputs: the prepare pass hydrates (no jobs), run proceeds
    val second = run()
    assert(second.contains("artifact ticks hydrated ["), second)
  }

  test("series manifest: written by materialize, fresh run skips, drifted file rebuilds") {
    import graft.pipeline.SeriesManifest
    val root = Files.createTempDirectory("graft_manifest")
    stage(root, "ev")
    val cfg = root.resolve("p.yaml")
    Files.writeString(cfg, chainedYaml("user_id").replaceAll("(?s)tasks:.*", ""))
    val serve = root.resolve("serve").toString

    def run(): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Cli.materialize(spark, cfg.toString, root.toString, serve,
        out = new PrintStream(buf, true, "UTF-8"), ifChanged = true)
      buf.toString("UTF-8")
    }

    val first = run()
    assert(first.contains("run "), first)
    val latest = java.nio.file.Paths.get(serve).resolve("latest").toRealPath()
    val m = SeriesManifest.read(latest.resolve(SeriesManifest.FileName))
    assert(m.cadence == "1h" && m.sampleKeys == Seq("user_id"))
    assert(m.sampleKeyTypes.length == 1)
    assert(m.features.map(_.id) == Seq("v") && m.targets.isEmpty)
    assert(m.rows > 0 && m.features.head.samples <= m.rows)
    assert(m.files.nonEmpty && m.files.forall(_.sha256.length == 64))
    // deep integrity: recorded digests match the bytes on disk
    assert(SeriesManifest.verify(latest))
    // row/sample counts describe the served dataset exactly
    val served = spark.read.parquet(latest.resolve(m.path).toString)
    assert(served.count() == m.rows)
    assert(served.where(org.apache.spark.sql.functions.col("v").isNotNull)
      .count() == m.features.head.samples)

    // manifest-fresh + fingerprint-fresh: the second materialize runs NO job
    val second = run()
    assert(second.contains("up to date"), second)

    // drift one data file under the live symlink: config + inputs still
    // fingerprint clean, but the manifest's stat check catches it → rebuild
    val dataFile = latest.resolve(m.files.head.relPath)
    Files.write(dataFile, "tampered".getBytes("UTF-8"))
    assert(!SeriesManifest.fresh(latest))
    val third = run()
    assert(!third.contains("up to date") && third.contains("run "), third)
    // the rebuilt run serves a fresh, verifiable manifest again
    val latest2 = java.nio.file.Paths.get(serve).resolve("latest").toRealPath()
    assert(latest2 != latest && SeriesManifest.verify(latest2))

    // validator: tampered manifest content is rejected, not served
    val mPath = latest2.resolve(SeriesManifest.FileName)
    Files.writeString(mPath, Files.readString(mPath)
      .replaceFirst("\"sample_keys\" : \\[ \"user_id\" \\]",
        "\"sample_keys\" : [ \"user_id\", \"user_id\" ]"))
    assertThrows[IllegalArgumentException](SeriesManifest.read(mPath))
    assert(!SeriesManifest.fresh(latest2))
  }

  test("series manifest counts expanded columns and records 0 for pruned vectors") {
    import graft.pipeline.{Config, SeriesManifest}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // A materialized dataset whose raw vector id `v` is series-EXPANDED
    // (partition field not a sample key → `v__@zone:...` columns,
    // Series.project) and whose target `w` was coverage-pruned away
    // entirely. build() must resolve by base-id prefix — counting col("v")
    // directly would throw AnalysisException and fail the materialize run.
    val paths = graft.sources.Runs.runPaths(
      Files.createTempDirectory("graft_manifest_exp").resolve("serve").toString,
      "run1")
    Files.createDirectories(paths.datasetDir)
    Seq((1L, Some(1.0), None: Option[Double]),
        (2L, Some(2.0), Some(3.0)),
        (3L, None: Option[Double], Some(4.0)))
      .toDF("t_us", "v__@zone:a", "v__@zone:b")
      .write.mode("overwrite").parquet(paths.datasetDir.toString)
    val ds = Config.DatasetDef("1h", Seq("t_us"),
      features = Seq(Config.VectorDef("v", "ev", "value")),
      targets = Seq(Config.VectorDef("w", "ev", "value")))
    val m = SeriesManifest.build(spark, paths, ds)
    assert(m.rows == 3)
    assert(m.features == Seq(SeriesManifest.Entry("v", 4)),
      "samples must sum across the expanded columns")
    assert(m.targets == Seq(SeriesManifest.Entry("w", 0)),
      "a coverage-pruned vector records 0 samples instead of failing")
  }

  test("incremental dedup index: the second run computes signatures for the increment only") {
    import graft.operators.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_dedup_index")
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "an entirely different document about something else here"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "completely fresh increment content with no duplicate at all"))
      .toDF("doc_id", "text")

    val r1 = IncrementalDedup.update(spark, idx, base, "text", "doc_id", "crawl-1")
    assert(!r1.skipped && r1.gen == 1 && r1.newSignatures == 3)
    val gen1Files = Files.list(idx.resolve("signatures").resolve("gen=1"))
      .toArray.map(_.toString).sorted.toSeq
    val gen1Mtimes = gen1Files.map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(f)).toMillis)

    val r2 = IncrementalDedup.update(spark, idx, inc, "text", "doc_id", "crawl-2")
    assert(!r2.skipped && r2.gen == 2, "second run appends a generation")
    // doc 10 is an exact re-crawl of doc 1's text: membership row, no
    // signature — only doc 11's genuinely new text signs
    assert(r2.newSignatures == 1,
      "run 2 must compute signatures for the increment's NEW texts only")
    // the stored generation is untouched: same files, same stats
    val gen1After = Files.list(idx.resolve("signatures").resolve("gen=1"))
      .toArray.map(_.toString).sorted.toSeq
    assert(gen1After == gen1Files && gen1After.map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(f)).toMillis) == gen1Mtimes,
      "run 2 must not rewrite run 1's stored signatures")
    // gen-2's signature store holds the one new text; its member map holds
    // both increment docs
    assert(spark.read.parquet(idx.resolve("signatures").resolve("gen=2")
      .toString).count() == 1)
    assert(spark.read.parquet(idx.resolve("members").resolve("gen=2")
      .toString).count() == 2)

    // increment+index equals from-scratch dupClusters on the union corpus
    val viaIndex = IncrementalDedup.clusters(spark, idx)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    val scratch = Dedup.dupClusters(base.unionByName(inc), "text", "doc_id")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(_.toSeq).toSet
    assert(viaIndex == scratch)
    // the cross-run duplicate landed in one cluster
    assert(viaIndex.exists(r => r(0) == 10L && r(1) == 1L))

    // idempotent replay: a committed generation key is a no-op
    val r3 = IncrementalDedup.update(spark, idx, inc, "text", "doc_id", "crawl-2")
    assert(r3.skipped && r3.gen == 2 && r3.newSignatures == 0)
    // parameter drift fails loudly instead of mixing incomparable signatures
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.update(spark, idx, inc, "text", "doc_id", "crawl-3",
        IncrementalDedup.Params(numPerm = 32))
    }
    assert(e.getMessage.contains("incomparable"))
  }

  test("force rebuilds everything; build output reports the plan") {
    val root = Files.createTempDirectory("graft_artifact_force")
    stage(root, "ev", "ev2")
    val project = Config.parseProject(disjointYaml)
    val store = root.resolve("artifacts")
    ArtifactGraph.build(spark, root.toString, project, store, out = quiet)

    val buf = new java.io.ByteArrayOutputStream()
    val res = ArtifactGraph.build(spark, root.toString, project, store,
      force = true, out = new PrintStream(buf, true, "UTF-8"))
    assert(res.rebuilt.length == 4)
    val outText = buf.toString("UTF-8")
    assert(outText.contains("artifact plan: rebuild ["), outText)
    assert(outText.contains("artifact ticks rebuilt ["), outText)
  }
}
