package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Path}

import graft.pipeline.Config

/** Observability config (reference config/observability.py validation
  * matrix) + the Spark-native run surface: stage-progress lines, heartbeat,
  * run-scoped log files, and the metrics.json engine-metric dump.
  */
class ObservabilitySpec extends SparkSpec {

  private def parseObs(body: String) =
    Config.parseProject(
      s"""observability:
         |$body
         |sources:
         |  - id: ev
         |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
         |streams:
         |  - id: s
         |    from: { source: ev }
         |    map: { time: ts, fields: [user_id, value] }
         |    partition_by: [user_id]
         |""".stripMargin).observability.get

  private def bad(body: String, msg: String): Unit = {
    val e = intercept[IllegalArgumentException](parseObs(body))
    assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
  }

  // --- validation matrix (reference LogOutputConfig/LoggingConfig rules) ---

  test("observability parses visuals, heartbeat, level, and outputs") {
    val o = parseObs(
      """  visuals: on
        |  heartbeat_interval_seconds: 2.5
        |  logging:
        |    level: warning
        |    outputs:
        |      - { transport: stderr }
        |      - { transport: fs, scope: execution, path: logs/run.log }
        |      - { transport: fs, path: /tmp/global.log }
        |""".stripMargin)
    assert(o.visuals.contains("ON"))
    assert(o.heartbeatSeconds.contains(2.5))
    assert(o.logging.get.level.contains("WARNING"))
    assert(o.logging.get.outputs.map(_.transport) == Seq("STDERR", "FS", "FS"))
    assert(o.logging.get.outputs(1).scope == "EXECUTION")
  }

  test("observability: boolean visuals normalize like the reference") {
    assert(parseObs("  visuals: false").visuals.contains("OFF"))
    assert(parseObs("  visuals: true").visuals.contains("ON"))
  }

  test("observability rejects the reference's invalid combinations") {
    bad("  visuals: LOUD", "visuals must be ON or OFF")
    bad("  heartbeat_interval_seconds: -1", "must be >= 0")
    bad("  logging: { level: CHATTY }", "level must be")
    bad("  logging: { outputs: [ { transport: pigeon } ] }",
      "transport must be")
    bad("  logging: { outputs: [ { transport: fs } ] }",
      "path must be set when transport=FS and scope=GLOBAL")
    bad("  logging: { outputs: [ { transport: fs, scope: execution, path: /abs/run.log } ] }",
      "path must be relative when scope=EXECUTION")
    bad("  logging: { outputs: [ { transport: stdout, path: x.log } ] }",
      "path is only valid when transport=FS")
    bad("  logging: { outputs: [ { transport: stderr, scope: execution } ] }",
      "scope=EXECUTION requires transport=FS")
    bad("  periscope: up", "unknown field")
  }

  // --- end-to-end run surface ---------------------------------------------

  test("materialize with observability writes progress, run log, and metrics.json") {
    val root: Path = Files.createTempDirectory("graft_obs_spec")
    val config = root.resolve("p.yaml")
    Files.writeString(config,
      """observability:
        |  visuals: on
        |  heartbeat_interval_seconds: 0.05
        |  logging:
        |    outputs:
        |      - { transport: stdout }
        |      - { transport: fs, scope: execution, path: logs/run.log }
        |sources:
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
        |""".stripMargin)
    val console = new ByteArrayOutputStream()
    val paths = Cli.materialize(spark, config.toString,
      "/root/testdata/sf0.001", root.resolve("serve").toString,
      out = new PrintStream(console, true, "UTF-8"))

    val printed = console.toString("UTF-8")
    assert(printed.contains("[progress] stage"), s"no progress lines:\n$printed")
    assert(printed.contains("[heartbeat]"), s"no heartbeat lines:\n$printed")

    // scope=EXECUTION log file lands under the run dir and carries the
    // same progress feed
    val runLog = paths.runRoot.resolve("logs/run.log")
    assert(Files.exists(runLog))
    assert(Files.readString(runLog).contains("[progress] stage"))

    // metrics.json: engine task metrics + the write action
    val metrics = Files.readString(paths.runRoot.resolve("metrics.json"))
    def long(key: String): Long = {
      val m = s""""$key": (-?\\d+)""".r
      m.findFirstMatchIn(metrics).map(_.group(1).toLong)
        .getOrElse(fail(s"missing $key in:\n$metrics"))
    }
    assert(long("tasks_completed") > 0)
    assert(long("stages_completed") > 0)
    assert(long("input_bytes") > 0)
    assert(long("task_time_ms") >= 0)
    assert(metrics.contains("\"actions\": ["), metrics)
    assert(metrics.contains("output_rows"), metrics)
  }

  test("materialize without observability still writes metrics.json, quietly") {
    val root: Path = Files.createTempDirectory("graft_obs_quiet")
    val config = root.resolve("p.yaml")
    Files.writeString(config,
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
        |""".stripMargin)
    val console = new ByteArrayOutputStream()
    val paths = Cli.materialize(spark, config.toString,
      "/root/testdata/sf0.001", root.resolve("serve").toString,
      out = new PrintStream(console, true, "UTF-8"))
    val printed = console.toString("UTF-8")
    assert(!printed.contains("[progress]") && !printed.contains("[heartbeat]"),
      s"quiet run leaked progress output:\n$printed")
    assert(Files.exists(paths.runRoot.resolve("metrics.json")))
  }
}
