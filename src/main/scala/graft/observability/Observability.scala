package graft.observability

import java.io.PrintStream
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

import graft.pipeline.Config.{LogOutputDef, ObservabilityDef}

/** Run observability (reference config/observability.py +
  * cli/visuals/rich/progress.py + execution/observability.py), expressed in
  * Spark's own units: the progress surface is stage/task completion from the
  * scheduler bus — the thing a 1000-executor run actually reports — not a
  * per-record iterator counter, and run metrics are the engine's task
  * metrics (input/shuffle bytes, task time) accumulated by a listener, so
  * they stay correct under AQE re-planning and cost nothing in the data
  * path.
  *
  * Lifecycle: [[Observability.start]] before the command's Spark actions,
  * [[Observability.finish]] after — finish unregisters the listeners, stops
  * the heartbeat, writes `metrics.json` into the run directory, and closes
  * any run-scoped log files.
  */
object Observability {

  /** One line per completed stage + engine-metric accumulation
    * (cli/visuals/rich/progress.py renders per-stage task bars from the same
    * scheduler feed; datapipeline's per-record ticks have no distributed
    * equivalent).
    */
  final class RunListener(sinks: () => Seq[PrintStream], visuals: Boolean)
      extends SparkListener {
    val stagesCompleted = new AtomicLong(0)
    val tasksCompleted = new AtomicLong(0)
    val inputBytes = new AtomicLong(0)
    val inputRecords = new AtomicLong(0)
    val shuffleReadBytes = new AtomicLong(0)
    val shuffleWriteBytes = new AtomicLong(0)
    val taskTimeMs = new AtomicLong(0)
    private val active = new AtomicLong(0)

    def activeStages: Long = active.get()

    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      active.incrementAndGet()

    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      active.decrementAndGet()
      stagesCompleted.incrementAndGet()
      if (visuals) {
        val info = sc.stageInfo
        val ms = for {
          a <- info.completionTime; b <- info.submissionTime
        } yield a - b
        val line = f"[progress] stage ${info.stageId}%4d ${info.numTasks}%5d tasks" +
          ms.map(m => f" ${m}%6d ms").getOrElse("") + s"  ${info.name.takeWhile(_ != '\n')}"
        sinks().foreach(_.println(line))
      }
    }

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasksCompleted.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        inputRecords.addAndGet(m.inputMetrics.recordsRead)
        shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        taskTimeMs.addAndGet(m.executorRunTime)
      }
    }
  }

  /** Per-action rows/duration from the SQL execution feed; AQE roots are
    * unwrapped to the final physical plan before reading numOutputRows.
    */
  final class ActionListener extends QueryExecutionListener {
    final case class Action(name: String, durationMs: Long, outputRows: Option[Long])
    private val log = new AtomicReference[List[Action]](Nil)

    def actions: List[Action] = log.get().reverse

    private def outputRows(qe: QueryExecution): Option[Long] = {
      val root = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      root.metrics.get("numOutputRows").map(_.value)
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val a = Action(funcName, durationNs / 1000000L,
        try outputRows(qe) catch { case _: Throwable => None })
      log.updateAndGet(a :: _)
      ()
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Periodic liveness line (reference heartbeat_interval_seconds): active
    * stages + cumulative task count, printed whether or not visuals are on —
    * the "is the cluster still working" signal for quiet shuffles.
    */
  final class Heartbeat(intervalMs: Long, listener: RunListener,
                        sinks: () => Seq[PrintStream]) {
    private val runner = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          Thread.sleep(intervalMs)
          sinks().foreach(_.println(
            s"[heartbeat] active_stages=${listener.activeStages} " +
              s"tasks_done=${listener.tasksCompleted.get()} " +
              s"input_bytes=${listener.inputBytes.get()}"))
        }
      } catch { case _: InterruptedException => }
    }, "graft-heartbeat")
    runner.setDaemon(true)
    def start(): Unit = runner.start()
    def stop(): Unit = { runner.interrupt(); runner.join(1000) }
  }

  final case class Handle(run: RunListener, actions: ActionListener,
                          heartbeat: Option[Heartbeat],
                          console: PrintStream,
                          globalSinks: Seq[(PrintStream, Boolean)]) {
    // listener threads read `sinks` while bindRunDir appends → immutable swap
    private val executionSinks =
      new AtomicReference[Seq[PrintStream]](Nil)
    @volatile private var executionOutputs: Seq[LogOutputDef] = Nil

    def setExecutionOutputs(outs: Seq[LogOutputDef]): Unit =
      executionOutputs = outs

    /** Open scope=EXECUTION FS outputs once the run directory exists
      * (their paths are relative to it by the config contract).
      */
    def bindRunDir(runRoot: Path): Unit = {
      val opened = executionOutputs.map { o =>
        val p = runRoot.resolve(o.path.getOrElse("run.log"))
        if (p.getParent != null) Files.createDirectories(p.getParent)
        new PrintStream(Files.newOutputStream(p), true, "UTF-8")
      }
      executionSinks.updateAndGet(_ ++ opened)
      ()
    }

    private[observability] def sinks: Seq[PrintStream] =
      (console +: globalSinks.map(_._1)) ++ executionSinks.get()

    private[observability] def closeFiles(): Unit = {
      globalSinks.collect { case (s, true) => s.close() }
      executionSinks.get().foreach(_.close())
    }
  }

  /** Register listeners + heartbeat per the project's observability config.
    * No config → metrics-only (listeners still run; they are scheduler-bus
    * consumers with no data-path cost) and console stays quiet.
    */
  def start(spark: SparkSession, obs: Option[ObservabilityDef],
            console: PrintStream = System.out): Handle = {
    val visuals = obs.flatMap(_.visuals).contains("ON")
    obs.flatMap(_.logging).flatMap(_.level).foreach { lvl =>
      // map python logging levels onto log4j's
      spark.sparkContext.setLogLevel(if (lvl == "CRITICAL") "FATAL" else lvl)
    }
    val outputs = obs.flatMap(_.logging).map(_.outputs).getOrElse(Nil)
    val globalSinks = outputs.flatMap { o =>
      (o.transport, o.scope) match {
        // the console is already an unconditional sink — adding it again
        // would double every progress/heartbeat line
        case ("STDOUT", _) => None
        case ("STDERR", _) => Some(System.err -> false)
        case ("FS", "GLOBAL") =>
          val p = java.nio.file.Paths.get(o.path.get)
          if (p.getParent != null) Files.createDirectories(p.getParent)
          Some(new PrintStream(Files.newOutputStream(p), true, "UTF-8") -> true)
        case _ => None // EXECUTION outputs bind later, under the run dir
      }
    }
    var handle: Handle = null
    val run = new RunListener(() => handle.sinks, visuals)
    val actions = new ActionListener
    val hb = obs.flatMap(_.heartbeatSeconds).filter(_ > 0).map(s =>
      new Heartbeat((s * 1000).toLong.max(1), run, () => handle.sinks))
    handle = Handle(run, actions, hb, console, globalSinks)
    handle.setExecutionOutputs(outputs.filter(o =>
      o.transport == "FS" && o.scope == "EXECUTION"))
    spark.sparkContext.addSparkListener(run)
    spark.listenerManager.register(actions)
    hb.foreach(_.start())
    handle
  }

  /** Unregister everything and write `metrics.json` next to `run.json`.
    * The listener bus is asynchronous, so bounded-wait until the action log
    * has drained before snapshotting.
    */
  def finish(spark: SparkSession, handle: Handle,
             metricsPath: Option[Path]): Unit = {
    handle.heartbeat.foreach(_.stop())
    // the SQL-execution event for the just-finished write may still be in
    // flight on the async bus. Earlier driver-side actions (coverage
    // collects, scaler fits) populate the log long before the final write,
    // so "non-empty" is not "drained" — wait until the count stops moving
    // for a settle window, bounded overall.
    // a stable count of ZERO settles too — but only after a LONGER stable
    // window (5 consecutive 100ms reads): the final write's listener event
    // may still be in flight on the async bus, and settling zero after one
    // sleep would unregister before it lands, losing every action from
    // metrics.json. A run that failed before any SQL action still exits in
    // ~0.5s instead of busy-waiting the whole 2s deadline.
    val deadline = System.nanoTime() + 2000000000L
    var last = -1
    var stableZero = 0
    var settled = false
    while (!settled && System.nanoTime() < deadline) {
      val n = handle.actions.actions.size
      if (n == last && n > 0) settled = true
      else if (n == 0 && last == 0 && stableZero >= 4) settled = true
      else {
        if (n == 0 && last == 0) stableZero += 1
        last = n
        Thread.sleep(100)
      }
    }
    spark.sparkContext.removeSparkListener(handle.run)
    spark.listenerManager.unregister(handle.actions)
    metricsPath.foreach { p =>
      Files.createDirectories(p.getParent)
      Files.writeString(p, metricsJson(handle))
    }
    handle.closeFiles()
  }

  private def metricsJson(h: Handle): String = {
    val r = h.run
    // action names are caller-supplied (custom funcName/command labels) —
    // escape them or a quote/backslash corrupts metrics.json
    val acts = h.actions.actions.map { a =>
      s"""{"name": ${graft.sources.Runs.jsonStr(a.name)}, "duration_ms": ${a.durationMs}, """ +
        s""""output_rows": ${a.outputRows.map(_.toString).getOrElse("null")}}"""
    }.mkString("[", ", ", "]")
    s"""{
       |  "stages_completed": ${r.stagesCompleted.get()},
       |  "tasks_completed": ${r.tasksCompleted.get()},
       |  "input_bytes": ${r.inputBytes.get()},
       |  "input_records": ${r.inputRecords.get()},
       |  "shuffle_read_bytes": ${r.shuffleReadBytes.get()},
       |  "shuffle_write_bytes": ${r.shuffleWriteBytes.get()},
       |  "task_time_ms": ${r.taskTimeMs.get()},
       |  "actions": $acts
       |}
       |""".stripMargin
  }
}
