package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{DatasetPipeline, Series}
import Q._

/** Composed end-to-end flows (reference pipelines/dataset/pipeline.py,
  * pipelines/series/projector.py): the full dataset journey as one plan, and
  * series projection with the reference's series_id suffix encoding.
  */
object QueriesPipeline {

  // --- dataset_pipeline config: shared between the Spark plan and the SQL
  // twin so thresholds/ratios/seeds cannot drift.
  // --- config_dataset: the literal YAML project the query runs (shape =
  // docs/config.md flattened into one document; see graft.pipeline.Config).
  private val ConfigDoc =
    """sources:
      |  - id: tpch.orders
      |    loader: { transport: fs, path: orders.parquet, reader: { format: parquet } }
      |streams:
      |  - id: orders.daily
      |    from: { source: tpch.orders }
      |    map: { time: o_orderdate, fields: [o_custkey, o_orderkey, o_totalprice, o_orderstatus] }
      |    partition_by: [o_custkey]
      |    tiebreak: [o_orderkey]
      |    preprocess:
      |      - { operation: where, field: o_orderstatus, operator: ne, comparand: P }
      |      - { operation: floor_time, cadence: 1d }
      |    transforms:
      |      - { operation: collapse, keep: last }
      |      - { operation: rolling, field: o_totalprice, window: 3, statistic: mean, to: m3, min_samples: 2 }
      |dataset:
      |  sample:
      |    cadence: 1d
      |    keys: [o_custkey]
      |  features:
      |    - { id: total, stream: orders.daily, field: o_totalprice }
      |    - { id: m3, stream: orders.daily, field: m3, scale: true }
      |  split:
      |    mode: hash
      |    seed: 7
      |    ratios: { train: 0.8, val: 0.1, test: 0.1 }
      |    folds:
      |      - { id: holdout, train: [train], validation: [val], test: [test] }
      |""".stripMargin

  // --- config_sequence: a project whose feature list declares a
  // `sequence: {size, stride}` policy (reference config/dataset/series.py:14)
  // next to a scalar feature; the sequenced vector is scaled elementwise.
  private val SeqConfigDoc =
    """sources:
      |  - id: ev
      |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
      |streams:
      |  - id: ev.stream
      |    from: { source: ev }
      |    map: { time: ts, fields: [user_id, event_id, value] }
      |    partition_by: [user_id]
      |    tiebreak: [event_id]
      |dataset:
      |  sample:
      |    cadence: 1h
      |    keys: [user_id]
      |  features:
      |    - { id: val, stream: ev.stream, field: value }
      |    - id: seq3
      |      stream: ev.stream
      |      field: value
      |      scale: true
      |      sequence: { size: 3, stride: 2 }
      |  split:
      |    mode: hash
      |    seed: 11
      |    ratios: { train: 0.75, test: 0.25 }
      |    folds:
      |      - { id: f0, train: [train], test: [test] }
      |""".stripMargin

  // --- config_tasks: one project document declaring FIVE named tasks
  // (reference config/tasks/{coverage,matrix,scaler,metadata,ticks}.py) that
  // all run from one YAML — coverage report, availability matrix, scaler
  // statistics, vector-contract metadata, and a canonical tick grid.
  private val TasksConfigDoc =
    """sources:
      |  - id: ev
      |    loader: { transport: fs, path: events.parquet, reader: { format: parquet } }
      |streams:
      |  - id: ev.stream
      |    from: { source: ev }
      |    map: { time: ts, fields: [user_id, event_id, value, event_type] }
      |    partition_by: [user_id]
      |    tiebreak: [event_id]
      |  - id: ev.purchases
      |    from: { stream: ev.stream }
      |    transforms:
      |      - { operation: where, field: event_type, operator: eq, comparand: purchase }
      |dataset:
      |  sample:
      |    cadence: 1h
      |    keys: [user_id]
      |  features:
      |    - { id: val, stream: ev.stream, field: value, scale: true }
      |    - { id: pval, stream: ev.purchases, field: value }
      |tasks:
      |  - { id: cov, task: coverage, threshold: 0.9, stage: assembled }
      |  - { id: mat, task: matrix, stage: assembled, max_cells: 1000000 }
      |  - { id: sc, task: scaler }
      |  - { id: meta, task: metadata }
      |  - { id: ticks, task: ticks, stream: ev.purchases, grid_by: [user_id] }
      |""".stripMargin

  // DuckDB twin of the five-task report — shared by config_tasks (direct
  // runTasks) and config_artifacts (the same report served through the
  // artifact graph's build-then-hydrate path).
  private val TasksReportSql =
    """WITH src AS (
         SELECT user_id, event_id, value, event_type, epoch_us(ts) AS t_us
         FROM events),
       asm AS (
         SELECT user_id, t_us - t_us % 3600000000 AS st,
                max(value) AS val,
                max(CASE WHEN event_type = 'purchase' THEN value END) AS pval
         FROM src GROUP BY 1, 2),
       covstats AS (
         SELECT count(*) AS present, count(val) AS nn_val,
                count(pval) AS nn_pval
         FROM asm),
       cov AS (
         SELECT 'val' AS item, present, nn_val AS non_null FROM covstats
         UNION ALL
         SELECT 'pval' AS item, present, nn_pval AS non_null FROM covstats),
       cov_rows AS (
         SELECT 'cov' AS task, item, 'coverage' AS metric,
                ROUND(CAST(non_null AS DOUBLE) / present, 6) AS value,
                CAST(NULL AS VARCHAR) AS value_str FROM cov
         UNION ALL
         SELECT 'cov', item, 'meets_threshold',
                CASE WHEN CAST(non_null AS DOUBLE) / present >= 0.9
                     THEN 1.0 ELSE 0.0 END, NULL FROM cov
         UNION ALL
         SELECT 'cov', item, 'non_null', CAST(non_null AS DOUBLE), NULL FROM cov
         UNION ALL
         SELECT 'cov', item, 'present', CAST(present AS DOUBLE), NULL FROM cov),
       mat_rows AS (
         SELECT 'mat' AS task,
                'val@' || CAST(st AS VARCHAR) || ', ' || CAST(user_id AS VARCHAR) AS item,
                'status' AS metric, CAST(NULL AS DOUBLE) AS value,
                'present' AS value_str
         FROM asm
         UNION ALL
         SELECT 'mat',
                'pval@' || CAST(st AS VARCHAR) || ', ' || CAST(user_id AS VARCHAR),
                'status', NULL,
                CASE WHEN pval IS NULL THEN 'null' ELSE 'present' END
         FROM asm),
       scstats AS (
         SELECT CAST(SUM(CAST(val AS DECIMAL(30,6))) AS DOUBLE) / COUNT(val) AS m,
                ROUND(GREATEST(COALESCE(stddev_pop(val), 0.0), 1e-12), 6) AS sd,
                CAST(COUNT(val) AS DOUBLE) AS c
         FROM asm),
       sc_rows AS (
         SELECT 'sc' AS task, 'val' AS item, 'mean' AS metric,
                ROUND(m, 6) AS value, CAST(NULL AS VARCHAR) AS value_str
         FROM scstats
         UNION ALL SELECT 'sc', 'val', 'std', ROUND(sd, 6), NULL FROM scstats
         UNION ALL SELECT 'sc', 'val', 'count', c, NULL FROM scstats),
       meta_rows AS (
         SELECT * FROM (VALUES
           ('meta', 'val', 'length', 0.0, 'scalar'),
           ('meta', 'val', 'is_target', 0.0, CAST(NULL AS VARCHAR)),
           ('meta', 'val', 'scaled', 1.0, NULL),
           ('meta', 'pval', 'length', 0.0, 'scalar'),
           ('meta', 'pval', 'is_target', 0.0, NULL),
           ('meta', 'pval', 'scaled', 0.0, NULL))
           AS t(task, item, metric, value, value_str)),
       ticks_rows AS (
         SELECT 'ticks' AS task, CAST(user_id AS VARCHAR) AS item,
                'tick_us' AS metric, CAST(t_us AS DOUBLE) AS value,
                CAST(NULL AS VARCHAR) AS value_str
         FROM (SELECT DISTINCT user_id, t_us FROM src
               WHERE event_type = 'purchase'))
       SELECT * FROM cov_rows
       UNION ALL SELECT * FROM mat_rows
       UNION ALL SELECT * FROM sc_rows
       UNION ALL SELECT * FROM meta_rows
       UNION ALL SELECT * FROM ticks_rows"""

  // --- config_corpus: the declarative corpus-curation journey — quality
  // gate → exact dedup → near-dup dedup → chunking, all from one `corpus:`
  // section (graft's config surface for the §2.7 operators).
  private val CorpusConfigDoc =
    """sources:
      |  - id: docs
      |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
      |corpus:
      |  source: docs
      |  id: doc_id
      |  text: text
      |  steps:
      |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
      |    - { step: dedup_exact }
      |    - { step: dedup_fuzzy, threshold: 0.5 }
      |    - { step: chunk, size: 64, stride: 48 }
      |""".stripMargin

  /** DuckDB twin of the corpus journey: filter verdicts → min-id exact
    * dedup → minhash cluster canonical-keep (recursive closure over the
    * CURATED subset) → overlapping token chunks.
    */
  private def corpusJourneySql: String =
    s"""WITH RECURSIVE
        verdicts AS (${QueriesLlm.corpusFilterSql}),
        kept0 AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN verdicts f USING (doc_id) WHERE f.keep),
        kept1 AS (
          SELECT k.doc_id, k.text FROM kept0 k
          JOIN (SELECT text, min(doc_id) AS doc_id
                FROM kept0 GROUP BY text) m
            ON m.text IS NOT DISTINCT FROM k.text AND m.doc_id = k.doc_id),
        ${QueriesLlm.minhashCtes("kept1")},
        ${QueriesLlm.minhashClosureCtes("kept1")},
        kept2 AS (
          SELECT k.doc_id, k.text FROM kept1 k
          JOIN lab ON lab.doc_id = k.doc_id
          WHERE lab.doc_id = lab.cluster_id),
        ${QueriesCuration.chunkTailSql("kept2", 64, 48)}"""

  // --- config_corpus_pretrain: the pretraining-example journey — quality
  // gate → exact dedup → span corruption, from one `corpus:` section; the
  // terminal `corrupt:` step reshapes the curated corpus into
  // (inputs, targets) pairs (the span_corrupt head inside the declarative
  // surface).
  private val PretrainConfigDoc =
    """sources:
      |  - id: docs
      |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
      |corpus:
      |  source: docs
      |  id: doc_id
      |  text: text
      |  steps:
      |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
      |    - { step: dedup_exact }
      |    - { step: corrupt }
      |""".stripMargin

  /** DuckDB twin: filter verdicts → min-id exact dedup → the shared
    * span-corruption tail over the CURATED subset.
    */
  private def pretrainJourneySql: String =
    s"""WITH
        verdicts AS (${QueriesLlm.corpusFilterSql}),
        kept0 AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN verdicts f USING (doc_id) WHERE f.keep),
        kept1 AS (
          SELECT k.doc_id, k.text FROM kept0 k
          JOIN (SELECT text, min(doc_id) AS doc_id
                FROM kept0 GROUP BY text) m
            ON m.text IS NOT DISTINCT FROM k.text AND m.doc_id = k.doc_id),
        ${QueriesMining.spanCorruptTailSql("kept1")}"""

  // --- config_corpus_fim: the FIM-example journey — the same curated
  // prefix as config_corpus_pretrain, ending in the terminal `fim:` step
  // (sha-gated per-row PSM reorder) instead of span corruption.
  private val FimConfigDoc =
    s"""sources:
       |  - id: docs
       |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
       |corpus:
       |  source: docs
       |  id: doc_id
       |  text: text
       |  steps:
       |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
       |    - { step: dedup_exact }
       |    - { step: fim, rate: ${QueriesMining.FimRate} }
       |""".stripMargin

  /** DuckDB twin: filter verdicts → min-id exact dedup → the shared
    * fim_-prefixed FIM tail over the CURATED subset (the pretrainJourneySql
    * discipline with the other terminal example builder).
    */
  private def fimJourneySql: String =
    s"""WITH
        verdicts AS (${QueriesLlm.corpusFilterSql}),
        kept0 AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN verdicts f USING (doc_id) WHERE f.keep),
        kept1 AS (
          SELECT k.doc_id, k.text FROM kept0 k
          JOIN (SELECT text, min(doc_id) AS doc_id
                FROM kept0 GROUP BY text) m
            ON m.text IS NOT DISTINCT FROM k.text AND m.doc_id = k.doc_id),
        ${QueriesMining.fimTailSql("kept1", QueriesMining.FimRate)}"""

  private val ColumnThreshold = 0.05
  private val RowThreshold = 0.9
  private val Ratios = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val Seed = 42
  private val Retained = Seq("n_events", "avg_value", "purchase_total")

  val queries: Map[String, QueryFn] = Map(
    // Assemble → coverage-select (bonus_total is all-NULL → dropped;
    // missing_feature absent → dropped) → conform → row-filter → hash split
    // → z-scale with train-fold-only statistics → per-fold outputs.
    "dataset_pipeline" -> { (s, d) =>
      val cfg = DatasetPipeline.Config(
        timeCol = "ts", cadence = "1h", sampleKeys = Seq("user_id"),
        features = Seq(
          "n_events" -> count(lit(1)),
          "avg_value" -> (sumDec(col("value")) / count(lit(1))),
          "purchase_total" ->
            sumDec(when(col("event_type") === "purchase", col("value"))),
          "bonus_total" ->
            sumDec(when(col("event_type") === "bonus_xyz", col("value")))),
        candidateFeatures =
          Seq("n_events", "avg_value", "purchase_total", "bonus_total",
            "missing_feature"),
        columnThreshold = ColumnThreshold, rowThreshold = RowThreshold,
        splitToken = col("user_id"), ratios = Ratios, seed = Seed,
        scaledFeatures = Seq("avg_value", "purchase_total"))
      val result = DatasetPipeline.run(events(s, d), cfg)
      require(result.retained == Retained,
        s"coverage selection drifted: ${result.retained}")
      result.dataset.select(col("fold"), col("user_id"),
        eu(col("sample_time")).as("sample_time_us"),
        col("n_events").cast("long").as("n_events"),
        round(col("avg_value"), 6).as("avg_value"),
        round(col("purchase_total"), 6).as("purchase_total"))
    },

    // A literal reference-style YAML project document (docs/config.md shape)
    // run unmodified: source → canonical stream (preprocess + ordered
    // transforms) → dataset (assembly, hash split, folds, train-only scaler).
    "config_dataset" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(ConfigDoc)
      graft.pipeline.ConfigRuntime.dataset(s, d, project)
        .select(col("fold"), col("role"), col("o_custkey"),
          eu(col("sample_time")).as("sample_time_us"),
          col("total"), round(col("m3"), 6).as("m3"))
    },

    // Sequence series policy from YAML: sliding windows (size 3, stride 2)
    // per user over the event stream, bucketed to the sample cadence, scaled
    // elementwise on train-fold element statistics. Window payloads are
    // emitted as comma-joined DECIMAL(30,6) strings — fixed-point renders
    // identically in both engines where raw double→string does not.
    "config_sequence" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(SeqConfigDoc)
      graft.pipeline.ConfigRuntime.dataset(s, d, project)
        .select(col("fold"), col("role"), col("user_id"),
          eu(col("sample_time")).as("sample_time_us"),
          col("val"),
          array_join(transform(col("seq3"),
            x => round(x, 6).cast("decimal(30,6)").cast("string")), ",")
            .as("seq3"))
    },

    // Declarative named tasks: five reports (coverage, matrix, scaler,
    // metadata, ticks) from ONE document, sharing one assembly shuffle.
    "config_tasks" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(TasksConfigDoc)
      graft.pipeline.ConfigRuntime.runTasks(s, d, project)
        .select(col("task"), col("item"), col("metric"),
          round(col("value"), 6).as("value"), col("value_str"))
    },

    // Incremental artifact graph (reference artifacts/planning.py:40 +
    // executor.py + hydration.py): build all five task artifacts into a
    // state-tracked root, then build AGAIN — the second pass classifies
    // every artifact current and serves the stored reports with no Spark
    // job. The returned frame is the HYDRATED union, so the parquet
    // round-trip through the artifact store is what the oracle checks.
    "config_artifacts" -> { (s, d) =>
      import java.nio.file.{Files, Paths}
      val project = graft.pipeline.Config.parseProject(TasksConfigDoc)
      val root = Paths.get("/tmp/graft_scratch/config_artifacts")
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
      Files.createDirectories(root)
      val sink = new java.io.PrintStream(java.io.OutputStream.nullOutputStream())
      val first = graft.pipeline.ArtifactGraph.build(s, d, project, root, out = sink)
      require(first.rebuilt.length == project.tasks.length,
        s"fresh root must rebuild everything, got ${first.rebuilt}")
      val second = graft.pipeline.ArtifactGraph.build(s, d, project, root, out = sink)
      require(second.rebuilt.isEmpty && second.freshness.outdated.isEmpty,
        s"unchanged inputs must hydrate everything, got ${second.rebuilt}")
      second.order.map(second.reports).reduce(_ unionByName _)
        .select(col("task"), col("item"), col("metric"),
          round(col("value"), 6).as("value"), col("value_str"))
    },

    // The declarative corpus-curation journey from ONE `corpus:` section:
    // quality gate → exact dedup (digest-keyed min-id keep) → near-dup
    // minhash clustering (canonical keep) → overlapping token chunks —
    // the config surface a training-data pipeline drives at 100 TB.
    "config_corpus" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(CorpusConfigDoc)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          col("chunk_text"))
    },

    // The pretraining-example journey: filter → exact dedup → span
    // corruption from ONE `corpus:` section — the terminal `corrupt:` step
    // reshapes the curated corpus into (inputs, targets) pairs.
    "config_corpus_pretrain" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(PretrainConfigDoc)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
    },

    // The FIM-example journey: filter → exact dedup → fill-in-the-middle
    // from ONE `corpus:` section — the terminal `fim:` step (sha-gated
    // per-row, zero shuffle) reshapes the curated corpus into PSM
    // pretraining examples through the SAME Curation.fimTransform builder
    // the standalone head (fim_transform) and the ingest twin (stream_fim)
    // run, so the three paths cannot drift.
    "config_corpus_fim" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(FimConfigDoc)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
    },

    // Synthetic tick source from YAML (reference sources/synthetic/time/
    // loader.py via config transport): a data-free bounded time grid with a
    // preprocess transform, proving the `transport: synthetic` config path.
    "config_synthetic" -> { (s, _) =>
      val project = graft.pipeline.Config.parseProject(
        """sources:
          |  - id: ticks
          |    loader:
          |      transport: synthetic
          |      args: { start: "2024-01-03", end: "2024-01-05 12:00:00", frequency: 90m }
          |streams:
          |  - id: grid
          |    from: { source: ticks }
          |    transforms:
          |      - { operation: encode_time, mode: hour_sin, to: h_sin }
          |""".stripMargin)
      graft.pipeline.ConfigRuntime.resolver(s, "/nonexistent", project)
        .stream("grid")
        .select(eu(col("time")).as("t_us"), round(col("h_sin"), 6).as("h_sin"))
    },

    // Series projection over events: partition identity (user_id, event_type)
    // minus sample key (user_id) → series_id suffix `@event_type:<value>`;
    // two configs fan each record into two identified series rows.
    // Scaler artifact lifecycle (reference artifacts/scaler.py): fit on the
    // train slice → save JSON artifact → LOAD it back → apply the loaded
    // statistics. The round-trip through the serialized artifact is what's
    // under test — drift in the JSON encoding would fail the hash.
    "scaler_artifact" -> { (s, d) =>
      import graft.pipeline.Artifacts
      val e = events(s, d)
      val train = e.filter(pmod(col("user_id"), lit(5)) =!= 0)
      val path = "/tmp/graft_scratch/scaler_artifact/scaler.json"
      Artifacts.saveScaler(path, Artifacts.fitScaler(train, Seq("value")))
      val loaded = Artifacts.loadScaler(path).swap.getOrElse(
        throw new IllegalStateException("expected a standard_scaler artifact"))
      Artifacts.applyScaler(e.select(col("event_id"), col("value")), loaded)
        .select(col("event_id"), round(col("value"), 6).as("scaled"))
    },

    "series_project" -> { (s, d) =>
      Series.project(events(s, d),
        partitionBy = Seq("user_id", "event_type"),
        sampleKeys = Seq("user_id"), timeCol = "ts",
        configs = Seq(Series.SeriesConfig("value", "value"),
          Series.SeriesConfig("evt", "event_id")))
        .select(col("series_id"), eu(col("time")).as("t_us"), col("value"),
          col("user_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "config_dataset" -> {
      // ratios canonicalized by label (reference rule): test .1 | train .8 | val .1
      val sortedRatios = Seq("test" -> 0.1, "train" -> 0.8, "val" -> 0.1)
      val token = "CAST(t_us AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
      s"""WITH src AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   epoch_us(o_orderdate) - epoch_us(o_orderdate) % 86400000000 AS t_us
            FROM orders WHERE o_orderstatus != 'P'),
          collapsed AS (
            SELECT o_custkey, t_us, o_orderkey, o_totalprice FROM (
              SELECT *, row_number() OVER (PARTITION BY o_custkey, t_us
                          ORDER BY t_us DESC, o_orderkey DESC) AS rn
              FROM src) WHERE rn = 1),
          rolled AS (
            SELECT o_custkey, t_us, o_totalprice AS total,
                   CASE WHEN count(o_totalprice) OVER w >= 2
                        THEN avg(o_totalprice) OVER w END AS m3
            FROM collapsed
            WINDOW w AS (PARTITION BY o_custkey ORDER BY t_us, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
          labeled AS (
            SELECT *, ${QueriesAssembly.hashSplitSql(token, 7, sortedRatios)} AS label
            FROM rolled),
          folded AS (
            SELECT 'holdout' AS fold,
                   CASE label WHEN 'train' THEN 'train'
                              WHEN 'val' THEN 'validation'
                              ELSE 'test' END AS role,
                   o_custkey, t_us AS sample_time_us, total, m3
            FROM labeled),
          stats AS (
            SELECT ${sumDecSql("m3", 6)} / COUNT(m3) AS m_mean,
                   ROUND(GREATEST(COALESCE(stddev_pop(m3), 0.0), 1e-12), 6) AS m_std
            FROM folded WHERE role = 'train')
          SELECT fold, role, o_custkey, sample_time_us, total,
                 ROUND((m3 - m_mean) / m_std, 6) AS m3
          FROM folded, stats"""
    },

    "dataset_pipeline" -> {
      val presentCount = Retained
        .map(c => s"CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END")
        .mkString("(", "\n             + ", ")")
      s"""WITH assembled AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(ts) % 3600000000 AS sample_time_us,
                   COUNT(*) AS n_events,
                   ${sumDecSql("value")} / COUNT(*) AS avg_value,
                   ${sumDecSql("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase_total
            FROM events GROUP BY user_id, 2),
          filtered AS (
            SELECT * FROM assembled
            WHERE $presentCount >= ${RowThreshold * Retained.size}),
          labeled AS (
            SELECT *, ${QueriesAssembly.hashSplitSql("user_id", Seed, Ratios)} AS fold
            FROM filtered),
          stats AS (
            SELECT ${sumDecSql("avg_value", 6)} / COUNT(avg_value) AS m_avg,
                   ROUND(GREATEST(COALESCE(stddev_pop(avg_value), 0.0), 1e-12), 6) AS s_avg,
                   ${sumDecSql("purchase_total", 6)} / COUNT(purchase_total) AS m_pt,
                   ROUND(GREATEST(COALESCE(stddev_pop(purchase_total), 0.0), 1e-12), 6) AS s_pt
            FROM labeled WHERE fold = 'train')
          SELECT fold, user_id, sample_time_us, n_events,
                 ROUND((avg_value - m_avg) / s_avg, 6) AS avg_value,
                 ROUND((purchase_total - m_pt) / s_pt, 6) AS purchase_total
          FROM labeled, stats"""
    },

    "config_tasks" -> TasksReportSql,

    // same document, same report — but served through the artifact graph's
    // build-then-hydrate path, so the oracle checks the stored round-trip
    "config_artifacts" -> TasksReportSql,

    "config_corpus" -> corpusJourneySql,
    "config_corpus_pretrain" -> pretrainJourneySql,
    "config_corpus_fim" -> fimJourneySql,

    "config_synthetic" ->
      s"""WITH g AS (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-03',
                     TIMESTAMP '2024-01-05 12:00:00', INTERVAL 90 MINUTE)) AS time)
          SELECT epoch_us(time) AS t_us,
                 ROUND(sin(${graft.functions.TimeFns.TwoPi} * CAST(hour(time) AS DOUBLE) / 24.0), 6) AS h_sin
          FROM g""",


    "config_sequence" -> {
      // ratios canonicalized by label: test .25 | train .75
      val sortedRatios = Seq("test" -> 0.25, "train" -> 0.75)
      val token = "CAST(st AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
      s"""WITH src AS (
            SELECT user_id, event_id, value, epoch_us(ts) AS t_us FROM events),
          seqd AS (
            SELECT user_id, t_us,
                   list(value) OVER w AS seq,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY t_us, event_id) AS rn
            FROM src
            WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
          emitted AS (
            SELECT user_id, t_us - t_us % 3600000000 AS st, seq
            FROM seqd WHERE rn >= 3 AND (rn - 3) % 2 = 0),
          seqcell AS (
            SELECT user_id, st, max(seq) AS seq FROM emitted GROUP BY 1, 2),
          valcell AS (
            SELECT user_id, t_us - t_us % 3600000000 AS st, max(value) AS val
            FROM src GROUP BY 1, 2),
          asm AS (
            SELECT coalesce(v.user_id, s.user_id) AS user_id,
                   coalesce(v.st, s.st) AS st, v.val, s.seq
            FROM valcell v FULL JOIN seqcell s
              ON v.user_id = s.user_id AND v.st = s.st),
          folded AS (
            SELECT 'f0' AS fold,
                   CASE ${QueriesAssembly.hashSplitSql(token, 11, sortedRatios)}
                     WHEN 'train' THEN 'train' ELSE 'test' END AS role,
                   user_id, st, val, seq
            FROM asm),
          stats AS (
            SELECT CAST(SUM(CAST(u.x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(u.x) AS m,
                   ROUND(GREATEST(COALESCE(stddev_pop(u.x), 0.0), 1e-12), 6) AS sd
            FROM (SELECT unnest(seq) AS x FROM folded WHERE role = 'train') u)
          SELECT fold, role, user_id, st AS sample_time_us, val,
                 array_to_string(list_transform(seq,
                   x -> CAST(CAST(ROUND((x - m) / sd, 6) AS DECIMAL(30,6)) AS VARCHAR)),
                   ',') AS seq3
          FROM folded, stats"""
    },

    "scaler_artifact" ->
      """WITH s AS (
           SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS m,
                  ROUND(GREATEST(coalesce(stddev_pop(value), 0), 1e-12), 6) AS sd
           FROM events WHERE user_id % 5 != 0)
         SELECT event_id, ROUND((value - m) / sd, 6) AS scaled
         FROM events, s""",

    "series_project" ->
      """SELECT 'value__@event_type:' || event_type AS series_id,
                epoch_us(ts) AS t_us, value, user_id
         FROM events
         UNION ALL
         SELECT 'evt__@event_type:' || event_type AS series_id,
                epoch_us(ts) AS t_us, CAST(event_id AS DOUBLE) AS value, user_id
         FROM events"""
  )
}
