package graft

import java.nio.file.{Files, Path}

import graft.pipeline.{Config, ConfigRuntime}
import graft.plugins.{Plugins, Scaffold}

/** Plugin SPI (plugins/Plugins.scala): ServiceLoader discovery, custom
  * reader formats, plugin transforms in a stream chain, SQL function
  * registration, and the scaffold command — the JVM twin of the reference's
  * entry-point plugin system (datapipeline/plugins.py, services/scaffold/).
  */
class PluginSpec extends SparkSpec {

  test("ServiceLoader discovers the classpath plugin") {
    assert(Plugins.all.exists(_.name == "spec-fixture"))
    assert(Plugins.loaderFormats.contains("tsv"))
    assert(Plugins.transformNames.contains("scale"))
    assert(Plugins.describe.exists(l =>
      l.contains("spec-fixture") && l.contains("tsv") && l.contains("scale")))
  }

  test("a plugin reader format and transform run inside a config stream") {
    val root: Path = Files.createTempDirectory("graft_plugin_spec")
    Files.writeString(root.resolve("ticks.tsv"),
      "user_id\tts\tvalue\n" +
        "1\t2024-01-01 00:00:00\t10.0\n" +
        "1\t2024-01-01 00:10:00\t20.0\n" +
        "2\t2024-01-01 00:00:00\t5.0\n")
    val yaml =
      """sources:
        |  - id: src
        |    loader: { transport: fs, path: ticks.tsv, reader: { format: tsv } }
        |streams:
        |  - id: s
        |    from: { source: src }
        |    map: { time: ts, fields: [user_id, value] }
        |    partition_by: [user_id]
        |    transforms:
        |      - { operation: plugin, name: scale, options: { field: value, factor: 2 } }
        |      - { operation: lag, field: value, periods: 1, to: value_lag }
        |""".stripMargin
    val project = Config.parseProject(yaml)
    val out = ConfigRuntime.resolver(spark, root.toString, project)
      .stream("s").collect()
      .map(r => (r.getAs[Number]("user_id").longValue, r.getAs[Double]("value"),
        Option(r.getAs[java.lang.Double]("value_lag")).map(_.toDouble)))
      .sortBy(t => (t._1, t._2))
    // plugin scale x2 runs BEFORE the builtin lag (declared order)
    assert(out.toSeq == Seq((1L, 20.0, None), (1L, 40.0, Some(20.0)),
      (2L, 10.0, None)))
  }

  test("plugin SQL functions register with the session") {
    val project = Config.parseProject(
      """sources:
        |  - id: src
        |    loader: { transport: fs, path: x.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: src }
        |    partition_by: [user_id]
        |""".stripMargin)
    ConfigRuntime.resolver(spark, "/tmp", project) // registration side effect
    assert(spark.sql("SELECT spec_plus_one(41)").head().getLong(0) == 42L)
  }

  test("unknown plugin transform and format fail the parse with the inventory") {
    val e = intercept[IllegalArgumentException](Config.parseOp(
      Map("operation" -> "plugin", "name" -> "no_such_op")))
    assert(e.getMessage.contains("unknown plugin transform 'no_such_op'"))
    assert(e.getMessage.contains("scale"), s"should list available: ${e.getMessage}")
    val f = intercept[IllegalArgumentException](Config.parseProject(
      """sources:
        |  - id: src
        |    loader: { transport: fs, path: x.bin, reader: { format: mystery } }
        |""".stripMargin))
    assert(f.getMessage.contains("unknown reader format 'mystery'"))
    assert(f.getMessage.contains("plugin formats: tsv"))
  }

  test("plugin transform factories validate options at parse time") {
    val e = intercept[IllegalArgumentException](Config.parseOp(
      Map("operation" -> "plugin", "name" -> "scale",
        "options" -> Map("factor" -> 2))))
    assert(e.getMessage.contains("'field' required"))
  }

  test("scaffold plugin writes a buildable skeleton and refuses to overwrite") {
    val out = Files.createTempDirectory("graft_scaffold_spec")
    val root = Scaffold.plugin("my-loader", out)
    assert(root == out.resolve("my-loader"))
    val cls = root.resolve("src/main/scala/my_loader/MyLoaderPlugin.scala")
    assert(Files.exists(cls))
    val body = Files.readString(cls)
    assert(body.contains("package my_loader"))
    assert(body.contains("class MyLoaderPlugin extends GraftPlugin"))
    val services = root.resolve(
      "src/main/resources/META-INF/services/graft.plugins.GraftPlugin")
    assert(Files.readString(services).trim == "my_loader.MyLoaderPlugin")
    assert(Files.exists(root.resolve("build.sbt")))
    // reference scaffold_plugin raises FileExistsError on a second run
    val e = intercept[IllegalArgumentException](Scaffold.plugin("my-loader", out))
    assert(e.getMessage.contains("already exists"))
    // bad names rejected before any IO
    intercept[IllegalArgumentException](Scaffold.plugin("BadName", out))
  }

  test("component scaffolds compile into the skeleton and discover via ServiceLoader") {
    import java.nio.file.{Files, Path}
    val out = Files.createTempDirectory("graft_scaffold_components")
    val root = Scaffold.plugin("acme-feed", out)

    // one of each kind; dto requires its domain first (reference dto.py)
    val e = intercept[IllegalArgumentException](
      Scaffold.component("dto", "tick", root))
    assert(e.getMessage.contains("needs its domain record first"))
    Scaffold.component("domain", "tick", root)
    Scaffold.component("dto", "tick", root)
    Scaffold.component("loader", "tickfile", root)
    Scaffold.component("parser", "tickline", root)
    Scaffold.component("mapper", "tickscale", root)
    // refuse overwrite + unknown kind + bad name, like the skeleton scaffold
    assert(intercept[IllegalArgumentException](
      Scaffold.component("mapper", "tickscale", root))
      .getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](
      Scaffold.component("widget", "x", root))
      .getMessage.contains("unknown component kind"))
    intercept[IllegalArgumentException](Scaffold.component("mapper", "Bad", root))
    // not-a-skeleton target refused before any IO
    assert(intercept[IllegalArgumentException](
      Scaffold.component("mapper", "x", out))
      .getMessage.contains("not a plugin skeleton"))

    // BUILD the scaffolded plugin: compile every generated source with the
    // in-process Scala compiler against this JVM's classpath (the skeleton's
    // build.sbt does the same against $SPARK_HOME/jars + graft)
    val srcs = Files.walk(root.resolve("src/main/scala")).iterator()
    val files = new scala.collection.mutable.ArrayBuffer[String]
    while (srcs.hasNext) {
      val p = srcs.next()
      if (p.toString.endsWith(".scala")) files += p.toString
    }
    assert(files.length == 6, s"skeleton + 5 components, got $files")
    val classesDir = Files.createTempDirectory("graft_scaffold_classes")
    val settings = new scala.tools.nsc.Settings()
    settings.usejavacp.value = true // forked tests: full classpath in java.class.path
    settings.outputDirs.setSingleOutput(classesDir.toString)
    val reporter =
      new scala.tools.nsc.reporters.StoreReporter(settings)
    val g = new scala.tools.nsc.Global(settings, reporter)
    new g.Run().compile(files.toList)
    assert(!reporter.hasErrors,
      s"scaffolded components must compile:\n${reporter.infos.mkString("\n")}")

    // DISCOVER via ServiceLoader over the built classes + the manifest
    val loader = new java.net.URLClassLoader(
      Array(classesDir.toUri.toURL,
        root.resolve("src/main/resources").toUri.toURL),
      getClass.getClassLoader)
    val foundIt = java.util.ServiceLoader
      .load(classOf[graft.plugins.GraftPlugin], loader)
      .iterator()
    val found = new scala.collection.mutable.ArrayBuffer[graft.plugins.GraftPlugin]
    while (foundIt.hasNext) found += foundIt.next()
    val byName = found.map(p => p.name -> p).toMap
    // the parent loader contributes the test-fixture plugin; the scaffolded
    // set must all be discovered through the built classes + manifest
    assert(Set("acme-feed", "tickfile-loader", "tickline-parser",
      "tickscale-mapper").subsetOf(byName.keySet), s"got ${byName.keySet}")
    assert(byName("tickfile-loader").loaders.keySet == Set("tickfile"))
    assert(byName("tickline-parser").loaders.keySet == Set("tickline"))
    assert(byName("tickscale-mapper").transforms.keySet == Set("tickscale"))
    // the mapper's op factory builds and runs as the SPI contract requires
    val op = byName("tickscale-mapper").transforms("tickscale")(Map.empty)
    val df = spark.range(3).toDF("x")
    assert(op(df, graft.operators.StreamKey(Seq.empty, timeCol = "x")).count() == 3)
    loader.close()
  }

  test("scaffold source/stream append valid entries and re-validate the document") {
    val root = Files.createTempDirectory("graft_scaffold_yaml")
    val yaml = root.resolve("project.yaml")
    Scaffold.source(yaml, "ticks", "events.parquet")
    Scaffold.stream(yaml, "s_ticks", "ticks", "user_id", timeField = "ts")
    val project = Config.parseProject(Files.readString(yaml))
    assert(project.source("ticks").format == "parquet")
    assert(project.stream("s_ticks").partitionBy == Seq("user_id"))
    // the scaffolded project materializes against real data as-is
    val df = ConfigRuntime.resolver(spark, "/root/testdata/sf0.001", project)
      .stream("s_ticks")
    assert(df.count() > 0)

    // duplicates and dangling references are refused (reference FileExistsError)
    assert(intercept[IllegalArgumentException](
      Scaffold.source(yaml, "ticks", "x.parquet"))
      .getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](
      Scaffold.stream(yaml, "s2", "nope", "user_id"))
      .getMessage.contains("unknown source 'nope'"))
    assert(intercept[IllegalArgumentException](
      Scaffold.source(yaml, "Bad-Id", "x.parquet"))
      .getMessage.contains("must be dot-separated"))
    // refused edits must not have corrupted the document
    assert(Config.parseProject(Files.readString(yaml)).sources.map(_.id) == Seq("ticks"))
  }

  test("scaffold demo runs out of the box: preview and materialize") {
    val out = Files.createTempDirectory("graft_demo_spec")
    val root = Scaffold.demo(out)
    val yaml = root.resolve("project.yaml").toString

    // preview profile: 12 rows of the synthetic grid to the console
    val console = new java.io.ByteArrayOutputStream()
    Cli.runProfile(spark, yaml, "demo", dataDir = "/nonexistent",
      out = new java.io.PrintStream(console, true, "UTF-8"))
    val lines = console.toString("UTF-8").linesIterator.toSeq
    assert(lines.length == 12, s"expected 12 preview rows:\n${lines.mkString("\n")}")

    // materialize profile: full grid parquet under a run dir + metrics.json
    val serve = out.resolve("serve")
    Cli.runProfile(spark, yaml, "materialize", dataDir = "/nonexistent",
      serveRoot = Some(serve.toString),
      out = new java.io.PrintStream(java.io.OutputStream.nullOutputStream()))
    val latest = serve.resolve("latest")
    assert(Files.exists(latest))
    val grid = spark.read.parquet(
      serve.resolve(Files.readSymbolicLink(latest).toString)
        .resolve("streams/grid").toString)
    // 2024-01-01 .. 2024-01-08 inclusive at 30m = 7 days * 48 + 1 ticks
    assert(grid.count() == 7 * 48 + 1)
    assert(grid.columns.toSet ==
      Set("time", "h_sin", "wd_sin", "h_sin_smooth"))
    // second scaffold refused
    intercept[IllegalArgumentException](Scaffold.demo(out))
  }

  test("http transport in config: loopback fetch, params, and stream read") {
    val root = Files.createTempDirectory("graft_http_cfg")
    val payload = root.resolve("ticks.jsonl")
    Files.writeString(payload,
      """{"user_id": 1, "ts": "2024-01-01 00:00:00", "value": 1.5}
        |{"user_id": 1, "ts": "2024-01-01 00:10:00", "value": 2.5}
        |{"user_id": 2, "ts": "2024-01-01 00:00:00", "value": 9.0}
        |""".stripMargin)
    val (server, url) = graft.sources.Http.serveFile(payload.toString, "/ticks.jsonl")
    try {
      val project = Config.parseProject(
        s"""sources:
           |  - id: remote
           |    loader:
           |      transport: http
           |      url: $url
           |      headers: { X-Graft: spec }
           |      params: { limit: "10" }
           |      reader: { format: jsonl }
           |streams:
           |  - id: s
           |    from: { source: remote }
           |    map: { time: ts, fields: [user_id, value] }
           |    partition_by: [user_id]
           |""".stripMargin)
      assert(project.source("remote").transport == "http")
      val rows = ConfigRuntime.resolver(spark, root.toString, project)
        .stream("s").collect()
      assert(rows.length == 3)
    } finally server.stop(0)
    // reference: "HTTP sources do not support parquet format"
    val e = intercept[IllegalArgumentException](Config.parseProject(
      """sources:
        |  - id: r
        |    loader: { transport: http, url: "http://x/y.parquet", reader: { format: parquet } }
        |""".stripMargin))
    assert(e.getMessage.contains("do not support format 'parquet'"))
    val f = intercept[IllegalArgumentException](Config.parseProject(
      """sources:
        |  - id: r
        |    loader: { transport: http, path: y.csv, reader: { format: csv } }
        |""".stripMargin))
    assert(f.getMessage.contains("http sources take 'url'"))
  }

  test("synthetic source config validation mirrors the reference") {
    def bad(loader: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException](Config.parseProject(
        s"""sources:
           |  - id: x
           |    loader: $loader
           |""".stripMargin))
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    // reference source_yaml.py: "Synthetic sources do not use a source format"
    bad("{ transport: synthetic, path: t.parquet, args: { start: \"2024-01-01\", end: \"2024-01-02\" } }",
      "synthetic sources take 'args'")
    bad("{ transport: synthetic, args: { end: \"2024-01-02\" } }",
      "requires args.start")
    bad("{ transport: synthetic, args: { start: \"2024-01-01\", end: \"2024-01-02\", surprise: 1 } }",
      "unknown field")
    bad("{ transport: carrier-pigeon, path: x.parquet }",
      "transport 'carrier-pigeon' is not supported")
  }
}
