package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Path}

import graft.sources.{Hygiene, Runs}

/** `graft.Cli list` (reference cli/commands/list_.py) and `graft.Cli clean`
  * (reference cli/commands/clean.py): inventory and spill-sweep reports.
  */
class CliInventorySpec extends SparkSpec {

  private def captured(body: PrintStream => Unit): String = {
    val buf = new ByteArrayOutputStream()
    body(new PrintStream(buf, true, "UTF-8"))
    buf.toString("UTF-8")
  }

  private def projectYaml(root: Path): String = {
    val p = root.resolve("p.yaml")
    Files.writeString(p,
      """sources:
        |  - id: ev
        |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: ev }
        |    partition_by: [user_id]
        |profiles:
        |  - { id: quick, cmd: stream, stream: s, preview: 3 }
        |""".stripMargin)
    p.toString
  }

  test("list prints project entities and the loader/transform registries") {
    val root = Files.createTempDirectory("graft_cli_list")
    val cfg = projectYaml(root)
    assert(captured(Cli.listInventory("sources", Some(cfg), _))
      .contains("ev  (parquet  events.parquet)"))
    assert(captured(Cli.listInventory("streams", Some(cfg), _)).trim == "s")
    assert(captured(Cli.listInventory("profiles", Some(cfg), _))
      .contains("quick  (stream)"))
    val loaders = captured(Cli.listInventory("loaders", None, _))
    assert(loaders.contains("parquet") && loaders.contains("tsv  (plugin)"))
    val transforms = captured(Cli.listInventory("transforms", None, _))
    assert(transforms.contains("rolling") && transforms.contains("scale  (plugin)"))
    val e = intercept[IllegalArgumentException](
      Cli.listInventory("gizmos", None, new PrintStream(
        java.io.OutputStream.nullOutputStream())))
    assert(e.getMessage.contains("unknown inventory"))
  }

  test("clean reports a dry run and deletes with --yes") {
    val serveRoot = Files.createTempDirectory("graft_cli_clean")
    val tmp = Hygiene.tempRoot(serveRoot)
    val orphan = tmp.resolve(s"${Hygiene.SpillDirPrefix}deadbeef")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("chunk-0"), "x" * 2048)

    val dry = captured(Cli.clean(serveRoot.toString, yes = false, None, _))
    assert(dry.contains("Found 1 graft sort spill directory:"), dry)
    assert(dry.contains("size=2.0 KiB"), dry)
    assert(dry.contains("Dry run only"), dry)
    assert(Files.exists(orphan), "dry run must not delete")

    val wet = captured(Cli.clean(serveRoot.toString, yes = true, None, _))
    assert(wet.contains("Removed 1 graft sort spill directory:"), wet)
    assert(!Files.exists(orphan), "--yes must delete")

    assert(captured(Cli.clean(serveRoot.toString, yes = true, None, _))
      .contains("No graft sort spill directories found."))
  }

  test("inspect profile and task command run one declared task") {
    val root = Files.createTempDirectory("graft_cli_task")
    val cfg = root.resolve("p.yaml")
    Files.writeString(cfg,
      """sources:
        |  - id: ev
        |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: ev }
        |    map: { time: ts, fields: [user_id, value] }
        |    partition_by: [user_id]
        |dataset:
        |  sample: { cadence: 1h, keys: [user_id] }
        |  features: [ { id: v, stream: s, field: value } ]
        |tasks:
        |  - { id: cov, task: coverage, threshold: 0.1, stage: assembled }
        |  - { id: meta, task: metadata }
        |profiles:
        |  - { id: check, cmd: inspect, operation: cov, preview: 50 }
        |""".stripMargin)

    // profile path: only the named task's rows, bounded by preview
    val viaProfile = captured(out => Cli.runProfile(spark, cfg.toString,
      "check", "/root/testdata/sf0.001", out = out))
    assert(viaProfile.nonEmpty && viaProfile.linesIterator.forall(_.startsWith("cov\t")),
      s"expected only cov rows:\n$viaProfile")

    // direct command path: the other task
    val viaCmd = captured(out => Cli.runTask(spark, cfg.toString, "meta",
      "/root/testdata/sf0.001", limit = 50, out = out))
    assert(viaCmd.nonEmpty && viaCmd.linesIterator.forall(_.startsWith("meta\t")),
      s"expected only meta rows:\n$viaCmd")

    // validation: unknown operation fails the parse; misplaced operation too
    val e = intercept[IllegalArgumentException](graft.pipeline.Config.parseProject(
      Files.readString(cfg).replace("operation: cov", "operation: nope")))
    assert(e.getMessage.contains("unknown task operation 'nope'"))
    val f = intercept[IllegalArgumentException](graft.pipeline.Config.parseProject(
      Files.readString(cfg).replace("cmd: inspect, operation: cov", "cmd: inspect")))
    assert(f.getMessage.contains("requires an 'operation'"))
    val g = intercept[IllegalArgumentException](
      Cli.runTask(spark, cfg.toString, "nope", "/root/testdata/sf0.001",
        out = new PrintStream(java.io.OutputStream.nullOutputStream())))
    assert(g.getMessage.contains("unknown task 'nope'"))
  }

  test("task --html writes a browsable matrix.html equal to the report frame") {
    val root = Files.createTempDirectory("graft_cli_html")
    val cfg = root.resolve("p.yaml")
    Files.writeString(cfg,
      """sources:
        |  - id: ev
        |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: ev }
        |    map: { time: ts, fields: [user_id, value] }
        |    partition_by: [user_id]
        |dataset:
        |  sample: { cadence: 1h, keys: [user_id] }
        |  features: [ { id: v, stream: s, field: value } ]
        |tasks:
        |  - { id: mat, task: matrix, stage: assembled }
        |  - { id: cov, task: coverage, threshold: 0.1, stage: assembled }
        |""".stripMargin)
    val runDir = root.resolve("serve/runs/r1")
    val dest = runDir.resolve("matrix.html")

    val text = captured(out => Cli.runTask(spark, cfg.toString, "mat",
      "/root/testdata/sf0.001", limit = 1000000, out = out,
      htmlOut = Some(dest)))
    assert(text.contains(s"html -> $dest"))
    val html = Files.readString(dest)
    assert(html.contains("Availability Matrix") &&
      html.contains("Feature Availability") &&
      html.contains("Target Availability"))
    // content equal to the frame: one status cell per report row, each
    // status class appearing exactly as often as the frame says
    val report = graft.pipeline.ConfigRuntime.runTasks(spark,
      "/root/testdata/sf0.001",
      graft.pipeline.Config.parseProject(Files.readString(cfg)),
      only = Some(Set("mat"))).collect()
    val byStatus = report.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    Seq("present", "null").foreach { st =>
      val inHtml = s"<td class='$st'>".r.findAllIn(html).length
      assert(inHtml == byStatus.getOrElse(st, 0),
        s"$st cells: html=$inHtml frame=${byStatus.getOrElse(st, 0)}")
    }
    // every group row label renders once per section that has columns
    val groups = report.map(_.getString(1).split("@", 2)(1)).distinct
    groups.foreach(g => assert(html.contains(s"<th>$g</th>"), s"missing group $g"))
    // no targets configured: the section degrades to the reference's
    // "No data." placeholder instead of an empty table
    assert(html.contains("No data."))

    // generic (non-matrix) reports render as a plain bounded table
    val covDest = runDir.resolve("cov.html")
    captured(out => Cli.runTask(spark, cfg.toString, "cov",
      "/root/testdata/sf0.001", limit = 50, out = out,
      htmlOut = Some(covDest)))
    val covHtml = Files.readString(covDest)
    assert(covHtml.contains("Task cov") && covHtml.contains("<td>coverage</td>"))
  }

  test("artifact cache: identical inputs hit, config or file drift misses") {
    val root = Files.createTempDirectory("graft_task_cache")
    // private copy of the source file so we can touch it for invalidation
    val data = root.resolve("data")
    Files.createDirectories(data)
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      data.resolve("events.parquet"))
    val cfg = root.resolve("p.yaml")
    def yaml(threshold: Double) =
      s"""sources:
         |  - id: ev
         |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
         |streams:
         |  - id: s
         |    from: { source: ev }
         |    map: { time: ts, fields: [user_id, value] }
         |    partition_by: [user_id]
         |dataset:
         |  sample: { cadence: 1h, keys: [user_id] }
         |  features: [ { id: v, stream: s, field: value } ]
         |tasks:
         |  - { id: cov, task: coverage, threshold: $threshold, stage: assembled }
         |""".stripMargin
    Files.writeString(cfg, yaml(0.1))
    val cache = root.resolve("cache")

    def run(): String = captured(out => Cli.runTask(spark, cfg.toString, "cov",
      data.toString, limit = 50, out = out, cacheDir = Some(cache)))

    val first = run()
    assert(first.contains("task cov computed ["), first)
    val second = run()
    assert(second.contains("task cov cached ["), second)
    // identical report either way
    assert(first.linesIterator.drop(1).toSeq == second.linesIterator.drop(1).toSeq)

    // config drift (changed threshold) → new fingerprint → recompute
    Files.writeString(cfg, yaml(0.2))
    assert(run().contains("task cov computed ["))

    // source-file drift (rewritten bytes → new mtime/size) → recompute
    Files.writeString(cfg, yaml(0.1))
    assert(run().contains("task cov cached ["), "back to the first fingerprint")
    val ev = data.resolve("events.parquet")
    Files.setLastModifiedTime(ev,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(ev).toMillis + 1234))
    assert(run().contains("task cov computed ["), "touched input must miss")
  }

  test("artifact cache fingerprints directory sources recursively") {
    val root = Files.createTempDirectory("graft_cache_nested")
    // directory-shaped source with a PARTITIONED layout: part files live in
    // subdirectories, which a shallow listing would never stat
    val data = root.resolve("data")
    val table = data.resolve("events.parquet")
    spark.read.format("parquet")
      .load("/root/testdata/sf0.001/events.parquet")
      .write.partitionBy("event_type").parquet(table.toString)
    val cfg = root.resolve("p.yaml")
    Files.writeString(cfg,
      """sources:
        |  - id: ev
        |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: ev }
        |    map: { time: ts, fields: [user_id, value] }
        |    partition_by: [user_id]
        |dataset:
        |  sample: { cadence: 1h, keys: [user_id] }
        |  features: [ { id: v, stream: s, field: value } ]
        |tasks:
        |  - { id: cov, task: coverage, threshold: 0.1, stage: assembled }
        |""".stripMargin)
    val cache = root.resolve("cache")
    def run(): String = captured(out => Cli.runTask(spark, cfg.toString, "cov",
      data.toString, limit = 5, out = out, cacheDir = Some(cache)))

    assert(run().contains("task cov computed ["))
    assert(run().contains("task cov cached ["))

    // touch ONE nested part file → the fingerprint must change
    import scala.jdk.CollectionConverters._
    val nested = scala.util.Using.resource(Files.walk(table))(
      _.iterator().asScala.find(p => Files.isRegularFile(p) &&
        p.getParent != table && p.getFileName.toString.endsWith(".parquet")).get)
    Files.setLastModifiedTime(nested,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(nested).toMillis + 4321))
    assert(run().contains("task cov computed ["),
      "a rewrite inside a partition subdirectory must invalidate")

    // an added partition directory (even before files land) invalidates too
    Files.createDirectories(table.resolve("event_type=zzz_new"))
    assert(run().contains("task cov computed ["),
      "an added partition subdirectory must invalidate")
  }

  test("materialize --if-changed: unchanged inputs keep serving latest") {
    val root = Files.createTempDirectory("graft_inc_mat")
    val data = root.resolve("data")
    Files.createDirectories(data)
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      data.resolve("events.parquet"))
    val cfg = root.resolve("p.yaml")
    def yaml(cadence: String) =
      s"""sources:
         |  - id: ev
         |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
         |streams:
         |  - id: s
         |    from: { source: ev }
         |    map: { time: ts, fields: [user_id, value] }
         |    partition_by: [user_id]
         |dataset:
         |  sample: { cadence: $cadence, keys: [user_id] }
         |  features: [ { id: v, stream: s, field: value } ]
         |""".stripMargin
    Files.writeString(cfg, yaml("1h"))
    val serve = root.resolve("serve").toString

    def run(): (Runs.RunPaths, String) = {
      val buf = new ByteArrayOutputStream()
      val p = Cli.materialize(spark, cfg.toString, data.toString, serve,
        out = new PrintStream(buf, true, "UTF-8"), ifChanged = true)
      (p, buf.toString("UTF-8"))
    }

    val (first, out1) = run()
    assert(out1.contains(s"run ${first.runId} ->"), out1)
    val (second, out2) = run()
    assert(second.runId == first.runId, "unchanged inputs must reuse the run")
    assert(out2.contains("up to date ["), out2)

    // config drift → a NEW run becomes latest
    Files.writeString(cfg, yaml("30m"))
    val (third, _) = run()
    assert(third.runId != first.runId)

    // reverting the config restores the OLD fingerprint, but latest now
    // points at the 30m run → recompute (latest is the live contract)
    Files.writeString(cfg, yaml("1h"))
    val (fourth, _) = run()
    assert(fourth.runId != first.runId && fourth.runId != third.runId)

    // input file drift → recompute
    val ev = data.resolve("events.parquet")
    Files.setLastModifiedTime(ev,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(ev).toMillis + 5000))
    val (fifth, _) = run()
    assert(fifth.runId != fourth.runId, "touched input must re-materialize")
  }

  test("http sources fingerprint by staged CONTENT, so a re-fetch of an identical payload still hits") {
    val root = Files.createTempDirectory("graft_http_fp")
    val payload = root.resolve("remote.csv")
    Files.writeString(payload, "user_id,value\n1,10.5\n2,20.25\n")
    val (server, url) = graft.sources.Http.serveFile(payload.toString, "/data.csv")
    try {
      val cfg = root.resolve("p.yaml")
      Files.writeString(cfg,
        s"""sources:
           |  - id: web
           |    loader:
           |      transport: http
           |      url: $url
           |      reader: { format: csv }
           |streams:
           |  - id: s
           |    from: { source: web }
           |    map: { time: value }
           |""".stripMargin)
      val project = graft.pipeline.Config.parseProject(Files.readString(cfg))
      val staged = graft.sources.Http.stagedPath(url, "web", "csv")

      graft.sources.Http.fetchToLocal(url, staged)
      val fp1 = graft.pipeline.ArtifactCache.datasetFingerprint(project, root.toString)
      Thread.sleep(5)
      // re-fetch the SAME payload: new mtime, same bytes → same fingerprint
      graft.sources.Http.fetchToLocal(url, staged)
      assert(graft.pipeline.ArtifactCache.datasetFingerprint(project,
        root.toString) == fp1,
        "a byte-identical re-fetch must not self-invalidate the cache")

      // changed payload → re-fetch → different fingerprint
      Files.writeString(payload, "user_id,value\n1,10.5\n2,20.25\n3,30.0\n")
      graft.sources.Http.fetchToLocal(url, staged)
      assert(graft.pipeline.ArtifactCache.datasetFingerprint(project,
        root.toString) != fp1, "a changed staged payload must invalidate")
    } finally server.stop(0)
  }

  test("scaffold inflow appends source + derived stream atomically") {
    val root = Files.createTempDirectory("graft_inflow")
    val yaml = root.resolve("p.yaml")

    // provider.dataset id → stream id drops the provider segment
    val sid = graft.plugins.Scaffold.inflow(yaml, "acme.events",
      "events.parquet", "parquet", "user_id")
    assert(sid == "events")
    val project = graft.pipeline.Config.parseProject(Files.readString(yaml))
    assert(project.sources.map(_.id) == Seq("acme.events"))
    assert(project.streams.map(_.id) == Seq("events"))
    assert(project.streams.head.partitionBy == Seq("user_id"))

    // undotted id → `<id>.stream`
    assert(graft.plugins.Scaffold.inflow(yaml, "ticks", "ticks.csv", "csv",
      "venue") == "ticks.stream")

    // failure (duplicate source) restores the document byte-for-byte
    val before = Files.readString(yaml)
    val e = intercept[IllegalArgumentException](graft.plugins.Scaffold.inflow(
      yaml, "acme.events", "other.parquet", "parquet", "user_id"))
    assert(e.getMessage.contains("already exists"))
    assert(Files.readString(yaml) == before, "failed inflow must roll back")

    // derived-stream collision rolls back the source half too
    val f = intercept[IllegalArgumentException](graft.plugins.Scaffold.inflow(
      yaml, "other.events", "other.parquet", "parquet", "user_id"))
    assert(f.getMessage.contains("stream id 'events' already exists"))
    assert(Files.readString(yaml) == before, "half-applied inflow must roll back")
  }

  test("version prints the library tag and runtime environment") {
    val out = captured(Cli.version)
    assert(out.startsWith(s"graft ${Cli.Version}"), out)
    assert(out.contains(s"spark: ${org.apache.spark.SPARK_VERSION}"), out)
    assert(out.contains("scala: 2.13"), out)
    assert(out.contains("java: "), out)
  }

  test("list formats mirrors loaders including plugin contributions") {
    val formats = captured(Cli.listInventory("formats", None, _))
    assert(formats == captured(Cli.listInventory("loaders", None, _)))
    assert(formats.contains("parquet") && formats.contains("tsv  (plugin)"))
  }

  test("materialize runs a corpus-only project's curation journey") {
    val root = Files.createTempDirectory("graft_mat_corpus")
    val cfg = root.resolve("p.yaml")
    def yaml(minQuality: Double) =
      s"""sources:
         |  - id: docs
         |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
         |corpus:
         |  source: docs
         |  steps:
         |    - { step: filter, min_quality: $minQuality }
         |    - { step: chunk, size: 64, stride: 48 }
         |""".stripMargin
    Files.writeString(cfg, yaml(0.3))
    val serve = root.resolve("serve").toString
    val quiet = new PrintStream(java.io.OutputStream.nullOutputStream())
    val paths = Cli.materialize(spark, cfg.toString, "/root/testdata/sf0.001",
      serve, out = quiet, ifChanged = true)
    val out = spark.read.parquet(paths.datasetDir.toString)
    assert(out.columns.toSet ==
      Set("doc_id", "chunk_id", "n_tokens", "chunk_text"))
    assert(out.count() > 0)

    // --if-changed: unchanged corpus config reuses the run; an edited STEP
    // (new threshold) must re-materialize — the corpus definition is part
    // of the incremental fingerprint
    val second = Cli.materialize(spark, cfg.toString, "/root/testdata/sf0.001",
      serve, out = quiet, ifChanged = true)
    assert(second.runId == paths.runId, "unchanged corpus config must reuse")
    Files.writeString(cfg, yaml(0.5))
    val third = Cli.materialize(spark, cfg.toString, "/root/testdata/sf0.001",
      serve, out = quiet, ifChanged = true)
    assert(third.runId != paths.runId, "edited corpus step must re-materialize")
  }

  test("clean --older-than spares young orphans") {
    val serveRoot = Files.createTempDirectory("graft_cli_clean_age")
    val tmp = Hygiene.tempRoot(serveRoot)
    val young = tmp.resolve(s"${Hygiene.SpillDirPrefix}young")
    Files.createDirectories(young)
    val out = captured(Cli.clean(serveRoot.toString, yes = true, Some("1h"), _))
    assert(out.contains("No graft sort spill directories found."), out)
    assert(Files.exists(young))
  }
}
