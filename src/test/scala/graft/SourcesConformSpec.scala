package graft

import org.apache.spark.sql.functions._

import graft.operators.Assembly
import graft.sources.Tables

/** Source codec round-trips and vector conform contract. */
class SourcesConformSpec extends SparkSpec {
  import spark.implicits._

  test("gzip csv round-trip preserves rows (codec auto-detect on read)") {
    val out = "/tmp/graft_scratch/spec_gzip_csv"
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    nation.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(out)
    val gzFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".csv.gz"))
    assert(gzFiles > 0, "expected gzip-compressed part files")
    val back = Tables.readCsv(spark, out, header = true,
      schemaDDL = Some("n_nationkey INT, n_name STRING, n_regionkey INT"))
    assert(back.count() == nation.count())
    assert(back.agg(sum("n_nationkey")).head().getLong(0) ==
      nation.agg(sum("n_nationkey")).head().getLong(0))
  }

  test("conform: contract order, missing → NULL, extras dropped, lengths checked") {
    val df = Seq((1L, 2.0, "extra", Seq(1.0, 2.0))).toDF("k", "a", "junk", "seq2")
    val out = Assembly.conform(df, Seq("k"), Seq(
      Assembly.VectorEntry("a"),
      Assembly.VectorEntry("b"),
      Assembly.VectorEntry("seq2", "sequence", 2)))
    assert(out.columns.toSeq == Seq("k", "a", "b", "seq2"))
    val row = out.head()
    assert(row.getDouble(1) == 2.0 && row.isNullAt(2))
    assert(row.getSeq[Double](3) == Seq(1.0, 2.0))
    // wrong sequence length → job fails (reference raises)
    val bad = Assembly.conform(df, Seq("k"),
      Seq(Assembly.VectorEntry("seq2", "sequence", 3)))
    intercept[Exception](bad.collect())
  }

  test("http adapter: param merge, fetch-to-local round-trip, 404 fails loudly") {
    import graft.sources.Http
    assert(Http.buildUrl("http://h/x", Nil) == "http://h/x")
    assert(Http.buildUrl("http://h/x?a=1", Seq("b" -> "2 3")) ==
      "http://h/x?a=1&b=2+3")
    val src = "/tmp/graft_scratch/spec_http_src.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src), "k,v\n1,a\n2,b\n")
    val (server, url) = Http.serveFile(src, "/data.csv")
    try {
      val dest = "/tmp/graft_scratch/spec_http_dst/data.csv"
      Http.fetchToLocal(url, dest)
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dest)) ==
        "k,v\n1,a\n2,b\n")
      intercept[Exception](
        Http.fetchToLocal(url.replace("/data.csv", "/missing"), dest + ".x"))
      // refetch into an existing, LONGER staged file must truncate — no
      // stale trailing bytes from the previous payload
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dest),
        "k,v\n1,a\n2,b\n3,c\n4,d\nSTALE-TRAILING-BYTES\n")
      Http.fetchToLocal(url, dest)
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dest)) ==
        "k,v\n1,a\n2,b\n")
    } finally server.stop(0)
  }

  test("run-scoped dirs: layout, metadata lifecycle, latest symlink swap") {
    import graft.sources.Runs
    val root = "/tmp/graft_scratch/spec_serve_root"
    val rootPath = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(rootPath))
      java.nio.file.Files.walk(rootPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    val t0 = java.time.Instant.parse("2026-01-02T03:04:05.123456Z")
    val id = Runs.makeRunId(t0)
    assert(id == "2026-01-02T03-04-05-123456Z") // filesystem-safe, sortable
    val p = Runs.runPaths(root, id)
    assert(p.datasetDir.toString == s"$root/runs/$id/dataset")
    Runs.startRun(p, t0)
    val meta1 = java.nio.file.Files.readString(p.metadataPath)
    assert(meta1.contains("\"status\": \"running\"") &&
      meta1.contains("\"finished_at\": null"))
    Runs.finishRun(p, "success", Some("ok"), t0.plusSeconds(60))
    val meta2 = java.nio.file.Files.readString(p.metadataPath)
    assert(meta2.contains("\"status\": \"success\"") &&
      meta2.contains(t0.toString)) // started_at preserved across finish
    val latest = java.nio.file.Paths.get(root, "latest")
    assert(java.nio.file.Files.isSymbolicLink(latest))
    assert(latest.toRealPath().toString == p.runRoot.toRealPath().toString)
    // a later FAILED run does not steal `latest` from the last good run
    val id2 = Runs.makeRunId(t0.plusSeconds(3600))
    val p2 = Runs.runPaths(root, id2)
    Runs.startRun(p2)
    Runs.finishRun(p2, "failed")
    assert(latest.toRealPath().toString == p.runRoot.toRealPath().toString)
    // a later successful run does
    val p3 = Runs.runPaths(root, Runs.makeRunId(t0.plusSeconds(7200)))
    Runs.startRun(p3)
    Runs.finishRun(p3, "success")
    assert(latest.toRealPath().toString == p3.runRoot.toRealPath().toString)
  }

  test("stdout sink writes tab-joined preview rows to the given stream") {
    import graft.sources.Runs
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("k", "v")
    val buf = new java.io.ByteArrayOutputStream()
    val n = Runs.writeText(df.orderBy("k"), limit = 10,
      out = new java.io.PrintStream(buf, true, "UTF-8"))
    assert(n == 2)
    assert(buf.toString("UTF-8") == "1\ta\n2\t\n")
  }

  test("cli materialize: config → run-scoped parquet, success metadata, preview") {
    val config =
      """sources:
        |  - id: tpch.orders
        |    loader: { transport: fs, path: orders.parquet, reader: { format: parquet } }
        |streams:
        |  - id: orders.daily
        |    from: { source: tpch.orders }
        |    map: { time: o_orderdate, fields: [o_custkey, o_orderkey, o_totalprice] }
        |    partition_by: [o_custkey]
        |    tiebreak: [o_orderkey]
        |    preprocess:
        |      - { operation: floor_time, cadence: 1d }
        |    transforms:
        |      - { operation: collapse, keep: last }
        |dataset:
        |  sample:
        |    cadence: 1d
        |    keys: [o_custkey]
        |  features:
        |    - { id: total, stream: orders.daily, field: o_totalprice }
        |""".stripMargin
    val cfgPath = "/tmp/graft_scratch/spec_cli/project.yaml"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/tmp/graft_scratch/spec_cli"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), config)
    val serve = "/tmp/graft_scratch/spec_cli_serve"
    val buf = new java.io.ByteArrayOutputStream()
    val paths = graft.Cli.materialize(spark, cfgPath, "/root/testdata/sf0.001",
      serve, preview = 3, out = new java.io.PrintStream(buf, true, "UTF-8"))
    val meta = java.nio.file.Files.readString(paths.metadataPath)
    assert(meta.contains("\"status\": \"success\""))
    val back = spark.read.parquet(s"$serve/latest/dataset")
    assert(back.count() > 0 && back.columns.contains("total"))
    val lines = buf.toString("UTF-8").linesIterator.toSeq
    assert(lines.head.startsWith(s"run ${paths.runId}"))
    assert(lines.size == 4) // header + 3 preview rows
    // stream preview path
    val buf2 = new java.io.ByteArrayOutputStream()
    val n = graft.Cli.streamPreview(spark, cfgPath, "orders.daily",
      "/root/testdata/sf0.001", limit = 5,
      out = new java.io.PrintStream(buf2, true, "UTF-8"))
    assert(n == 5 && buf2.toString("UTF-8").linesIterator.size == 5)
    // multi-output run: every canonical stream lands under runs/<id>/streams/
    val p2 = graft.Cli.materializeStreams(spark, cfgPath,
      "/root/testdata/sf0.001", serve,
      out = new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
    val streamOut = spark.read.parquet(
      p2.runRoot.resolve("streams").resolve("orders.daily").toString)
    assert(streamOut.count() > 0)
    assert(java.nio.file.Files.readString(p2.metadataPath)
      .contains("\"status\": \"success\""))
  }

  test("cli materialize failure marks the run failed; latest stays on the last good run") {
    val badCfg = "/tmp/graft_scratch/spec_cli_bad/project.yaml"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/tmp/graft_scratch/spec_cli_bad"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(badCfg),
      """sources:
        |  - id: nope
        |    loader: { transport: fs, path: does_not_exist.parquet, reader: { format: parquet } }
        |streams:
        |  - id: s
        |    from: { source: nope }
        |    map: { time: ts }
        |    partition_by: [user_id]
        |dataset:
        |  sample: { cadence: 1h, keys: [user_id] }
        |  features:
        |    - { id: v, stream: s, field: value }
        |""".stripMargin)
    val serve = "/tmp/graft_scratch/spec_cli_bad_serve"
    val servePath = java.nio.file.Paths.get(serve)
    if (java.nio.file.Files.exists(servePath))
      java.nio.file.Files.walk(servePath).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    // a plan-build failure (missing source) never opens a run at all —
    // the run lifecycle wraps EXECUTION, like the reference's request
    // builder failing before run_profiles starts
    intercept[Exception](graft.Cli.materialize(spark, badCfg, "/root/testdata/sf0.001",
      serve, out = new java.io.PrintStream(new java.io.ByteArrayOutputStream())))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(serve, "runs")))
    // an EXECUTION failure records a failed run and does not repoint latest
    import graft.sources.Runs
    val p = Runs.runPaths(serve, Runs.makeRunId())
    Runs.startRun(p)
    Runs.finishRun(p, "failed", Some("executor died"))
    val meta = java.nio.file.Files.readString(p.metadataPath)
    assert(meta.contains("\"status\": \"failed\"") &&
      meta.contains("executor died"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(serve, "latest")))
  }

  test("watermark drops late data across micro-batches (append mode)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    // two files = two micro-batches (maxFilesPerTrigger=1). Batch 1 advances
    // the watermark to 12:00-10min; batch 2's 09:00 event is older than the
    // watermark and must be dropped from the aggregation, while its 11:58
    // event (late but inside the 10min allowance for the open 11:00 window)
    // still counts.
    val dir = "/tmp/graft_scratch/spec_watermark"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    java.nio.file.Files.createDirectories(p)
    import spark.implicits._
    def write(name: String, rows: Seq[(String, Double)]): Unit =
      rows.toDF("ts_s", "value")
        .select(col("ts_s").cast("timestamp").as("ts"), col("value"))
        .repartition(1).write.mode("overwrite").parquet(s"$dir/$name")
    write("b1", Seq(("2024-01-01 11:05:00", 1.0), ("2024-01-01 12:00:00", 2.0)))
    // staged batches move in one at a time after the previous run commits
    write("b2", Seq(("2024-01-01 09:00:00", 100.0), ("2024-01-01 11:58:00", 4.0)))
    write("b3", Seq(("2024-01-01 13:30:00", 8.0)))
    val src = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def move(from: String): Unit = {
      val f = new java.io.File(s"$dir/$from").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(src, s"$from.parquet"))
    }
    move("b1")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    def run(): Unit = {
      // this spec exercises ENGINE watermark semantics for append-mode
      // windowed aggregation — a shape whose final emission needs the
      // no-data micro-batch the library's streaming surface disables
      // (Streaming.ensureParquetCompat, r16: none of the declared queries
      // emits from one). Pin it ON here so the spec is insulated from the
      // session-level setting another test's stream read may have left.
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      try {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(sum(col("value")).as("total"))
          .select(col("window.start").cast("string").as("h"), col("total"))
          .writeStream.format("parquet").outputMode("append")
          .option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
    // run 1: watermark advances to 11:50. run 2: the 09:00 event is below
    // the watermark and is dropped; the late-but-allowed 11:58 event still
    // lands in the open 11:00 window. run 3: 13:30 pushes the watermark to
    // 13:20, closing (= append-emitting) the 11:00 and 12:00 windows.
    run()
    move("b2")
    run()
    move("b3")
    run()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!out.keys.exists(_.contains("09:00:00")), s"late data leaked: $out")
    assert(out.exists { case (h, v) => h.contains("11:00:00") && v == 5.0 },
      s"expected 11:00 window total 5.0 (on-time + allowed-late), got: $out")
    assert(out.exists { case (h, v) => h.contains("12:00:00") && v == 2.0 },
      s"expected 12:00 window total 2.0, got: $out")
  }

  test("stateful streaming counts equal the batch group-by") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming
      .runUserCountsToBatch(spark, sf, "spec_stateful")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
