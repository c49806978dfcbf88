package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Crawl, Dedup, Sharding, Similarity}
import Q._

/** Round-9 serving/reporting heads: quality-aware dedup canonical selection,
  * deterministic training-order shuffle, the per-source corpus report card,
  * crawl-generation diff, and the composed IVF+PQ ANN index. Oracles are
  * generated from the SAME constants as the Spark plans (house rule — the
  * two sides cannot drift).
  */
object QueriesServe {

  // shared constants — the Spark plans and the oracle SQL both read these
  private val ShardBudget = 2000L
  private val ShuffleSeed = 11
  private val IpqDim = 64
  private val IpqM = 8
  private val IpqKs = 16
  private val IpqKc = 8
  private val IpqNprobe = 2
  private val IpqK = 5

  // --- SQL twins of graft.functions.Text ----------------------------------

  private def occSql(m: String): String =
    s"(length(text) - length(replace(text, '$m', ''))) / ${m.length}"

  /** Text.qualityScore twin (same op order, rounded 6). */
  private[queries] def qualitySql: String = {
    val stops = Text.StopMarkers.map(occSql).mkString(" + ")
    s"""ROUND(LEAST(1.0, CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 100.0)
        * (1.0 - CAST(length(text) - length(translate(text, '${Text.PunctChars}', '')) AS DOUBLE)
                 / GREATEST(length(text), 1))
        * (0.5 + LEAST(($stops) / CAST(GREATEST(len(regexp_extract_all(text, '\\S+')), 1) AS DOUBLE) * 2.0, 0.5)),
        6)"""
  }

  /** Curation.hashRatio twin: sha256 53-bit ratio in [0,1). */
  private def ratioSql(tokenExpr: String, seed: Int): String =
    s"CAST(CAST('0x' || substr(sha256('$seed|' || CAST($tokenExpr AS VARCHAR)), 3, 14) AS BIGINT) & 9007199254740991 AS DOUBLE) / 9007199254740992.0"

  // ------------------------------------------------------------ oracle SQL

  private def dedupKeepBestSql: String =
    s"""WITH RECURSIVE ${QueriesLlm.minhashCtes()},
        ${QueriesLlm.minhashClosureCtes("documents")},
        quality AS (SELECT doc_id, $qualitySql AS score FROM documents),
        sized AS (
          SELECT doc_id, cluster_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cluster_size
          FROM lab)
        SELECT s.doc_id, s.cluster_id, s.cluster_size, q.score,
               row_number() OVER (PARTITION BY s.cluster_id
                 ORDER BY q.score DESC, s.doc_id ASC) = 1 AS keep
        FROM sized s JOIN quality q USING (doc_id)"""

  private def shardShuffleSql: String =
    s"""WITH toked AS (
          SELECT doc_id, source,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens
          FROM documents),
        assigned AS (
          SELECT doc_id, source, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $ShardBudget AS BIGINT) AS shard_id
          FROM toked)
        SELECT doc_id, source, shard_id, n_tokens,
               row_number() OVER (PARTITION BY source, shard_id
                 ORDER BY ${ratioSql("doc_id", ShuffleSeed)}, doc_id) AS pos,
               ${ratioSql("source || '/' || CAST(shard_id AS VARCHAR)",
                 ShuffleSeed)} AS shard_key
        FROM assigned"""

  /** quality_threshold_sweep twin: 20 thresholds (i × 0.05 as the SAME
    * IEEE double multiply the Spark side runs — DuckDB's bare `level *
    * 0.05` would be exact DECIMAL and disagree with the JVM at e.g.
    * 17 × 0.05), keep counts from ONE aggregate.
    */
  private def qualitySweepSql: String = {
    val th = "CAST(level AS DOUBLE) * CAST(0.05 AS DOUBLE)"
    s"""WITH q AS (SELECT $qualitySql AS q FROM documents),
        t AS (SELECT unnest(generate_series(0, 19)) AS level)
        SELECT level,
               $th AS threshold,
               CAST(SUM(CASE WHEN q.q >= $th THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN q.q >= $th THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS keep_rate
        FROM q, t GROUP BY level"""
  }

  private def corpusStatsSql: String =
    s"""SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
            AS n_tokens,
          ROUND(CAST(SUM(CAST(q AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6)
            AS mean_quality,
          CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_en
        FROM (SELECT source, lang, text, $qualitySql AS q FROM documents)
        GROUP BY source"""

  private def corpusDiffSql: String =
    s"""WITH ga AS (
          SELECT doc_id, sha256(text) AS dgst
          FROM documents WHERE doc_id % 3 != 0),
        gb AS (
          SELECT doc_id,
                 sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' (rev)'
                             ELSE text END) AS dgst
          FROM documents WHERE doc_id % 5 != 0)
        SELECT coalesce(ga.doc_id, gb.doc_id) AS doc_id,
               CASE WHEN ga.dgst IS NULL THEN 'added'
                    WHEN gb.dgst IS NULL THEN 'removed'
                    WHEN ga.dgst = gb.dgst THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM ga FULL OUTER JOIN gb ON ga.doc_id = gb.doc_id"""

  /** quality_length_corr twin: the same six exact-decimal moment sums and
    * the one IEEE Pearson expression at the end, shapes mirrored
    * term-for-term.
    */
  private def qualityLengthCorrSql: String = {
    val n = "CAST(n AS DOUBLE)"
    val sx = "CAST(sx AS DOUBLE)"
    val sxx = "CAST(sxx AS DOUBLE)"
    val den = s"(sqrt($n * $sxx - $sx * $sx) * sqrt($n * syy - sy * sy))"
    s"""WITH scored AS (
          ${QueriesLlm.qualityScoreSql("documents", Seq("source"))}),
        base AS (
          SELECT s.source,
                 CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT)
                   AS x,
                 s.quality AS y
          FROM scored s JOIN documents d USING (doc_id)),
        a AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(30,6)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(30,6)))
                   AS DOUBLE) AS syy
          FROM base GROUP BY source)
        SELECT source, n,
               CASE WHEN $den = 0 THEN 0.0
                    ELSE ROUND(($n * sxy - $sx * sy) / $den, 6)
               END AS r
        FROM a"""
  }

  /** corpus_drift twin: the same quality buckets, counts, and PSI terms
    * under add-1 smoothing — expression shapes mirror the Spark plan so
    * every IEEE step agrees. Shared by the batch head and the streaming
    * drift monitor (the stream's final emission equals the batch head).
    */
  private[queries] def corpusDriftSql: String =
    s"""WITH scored AS (${QueriesLlm.qualityScoreSql("documents")}),
        docs AS (
          SELECT least(CAST(floor(quality * 10) AS INTEGER), 9) AS bucket,
                 doc_id % 5 = 0 AS cur
          FROM scored),
        counts AS (
          SELECT bucket,
                 CAST(sum(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_ref,
                 CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cur
          FROM docs GROUP BY bucket),
        tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts),
        spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        j AS (
          SELECT s.bucket,
                 coalesce(c.n_ref, 0) AS n_ref,
                 coalesce(c.n_cur, 0) AS n_cur
          FROM spine s LEFT JOIN counts c USING (bucket))
        SELECT CAST(bucket AS INTEGER) AS bucket, n_ref, n_cur,
               ROUND(((CAST(n_cur AS DOUBLE) + 1.0)
                        / (CAST(tc AS DOUBLE) + 10.0)
                      - (CAST(n_ref AS DOUBLE) + 1.0)
                        / (CAST(tr AS DOUBLE) + 10.0))
                     * ln(((CAST(n_cur AS DOUBLE) + 1.0)
                             / (CAST(tc AS DOUBLE) + 10.0))
                          / ((CAST(n_ref AS DOUBLE) + 1.0)
                             / (CAST(tr AS DOUBLE) + 10.0))), 6) AS psi
        FROM j, tot"""

  /** config_corpus_budget twin: the filter verdicts feed the budget step's
    * bucket-histogram replay (same sha256-ratio and cutoff arithmetic as
    * budget_sample's oracle).
    */
  private def corpusBudgetSql: String =
    s"""WITH verdicts AS (${QueriesLlm.corpusFilterSql}),
        kept0 AS (
          SELECT d.doc_id, d.text, d.source, d.lang FROM documents d
          JOIN verdicts f USING (doc_id) WHERE f.keep),
        base AS (
          SELECT doc_id, source, lang,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tk,
                 CAST(floor(${QueriesCuration.ratioSql("doc_id", 7)} * 256)
                   AS INTEGER) AS bk
          FROM kept0),
        hist AS (
          SELECT source, bk, sum(tk) AS bt FROM base GROUP BY source, bk),
        cum AS (
          SELECT source, bk,
                 sum(bt) OVER (PARTITION BY source ORDER BY bk) AS cum
          FROM hist),
        cutoff AS (
          SELECT source, max(bk) AS cut FROM cum
          WHERE cum <= 200 GROUP BY source)
        SELECT b.doc_id, b.source, b.lang
        FROM base b LEFT JOIN cutoff c USING (source)
        WHERE b.bk <= coalesce(c.cut, -1)"""

  /** config_corpus_order twin: quality gate → best-quality near-dup keep →
    * shuffled token-budgeted sharding, fully composed (shared builders:
    * QueriesLlm.corpusFilterSql / minhashCtes / minhashClosureCtes,
    * [[qualitySql]], [[ratioSql]]).
    */
  private def corpusOrderSql: String =
    s"""WITH RECURSIVE
        verdicts AS (${QueriesLlm.corpusFilterSql}),
        kept0 AS (
          SELECT d.doc_id, d.text, d.source FROM documents d
          JOIN verdicts f USING (doc_id) WHERE f.keep),
        ${QueriesLlm.minhashCtes("kept0")},
        ${QueriesLlm.minhashClosureCtes("kept0")},
        quality AS (SELECT doc_id, $qualitySql AS score FROM kept0),
        keepers AS (
          SELECT doc_id FROM (
            SELECT l.doc_id,
                   row_number() OVER (PARTITION BY l.cluster_id
                     ORDER BY q.score DESC, l.doc_id ASC) AS r
            FROM lab l JOIN quality q USING (doc_id))
          WHERE r = 1),
        kept1 AS (
          SELECT k.doc_id, k.text, k.source FROM kept0 k
          JOIN keepers USING (doc_id)),
        toked AS (
          SELECT doc_id, source,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens
          FROM kept1),
        assigned AS (
          SELECT doc_id, source, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $ShardBudget AS BIGINT) AS shard_id
          FROM toked)
        SELECT doc_id, source, shard_id, n_tokens,
               row_number() OVER (PARTITION BY source, shard_id
                 ORDER BY ${ratioSql("doc_id", ShuffleSeed)}, doc_id) AS pos,
               ${ratioSql("source || '/' || CAST(shard_id AS VARCHAR)",
                 ShuffleSeed)} AS shard_key
        FROM assigned"""

  /** config_corpus_diff / stream_corpus_diff twin: the incremental-crawl
    * gate (keep added ∪ changed vs the staged previous snapshot) followed
    * by the repetition quality gate — digest sentinel scheme shared with
    * the runtime ("t:"/null:).
    */
  private def corpusDiffJourneySql: String =
    s"""WITH prev AS (
          SELECT doc_id,
                 sha256(coalesce('t:' ||
                   CASE WHEN doc_id % 9 = 0 THEN text || ' old' ELSE text END,
                   'null:')) AS pd
          FROM documents WHERE doc_id % 4 != 0),
        cur AS (
          SELECT doc_id, source, text,
                 sha256(coalesce('t:' || text, 'null:')) AS cd
          FROM documents),
        gated AS (
          SELECT c.doc_id, c.source, c.text FROM cur c
          LEFT JOIN prev p USING (doc_id)
          WHERE p.pd IS NULL OR p.pd != c.cd)
        SELECT g.doc_id, g.source FROM gated g
        WHERE ${QueriesCorpus.repSql("g")} <= 0.8"""

  private def annIvfPqSql: String =
    s"""WITH ${annIvfPqCtes()}
        SELECT query_id, neighbor_id, centroid_id, adist, rnk
        FROM ranked WHERE rnk <= $IpqK"""

  /** ann_recall twin: recall@1 of the IVF-ADC index on the planted-
    * duplicate corpus (the dedup_semantic precedent — the synthetic
    * embeddings are near-orthogonal, so only a PLANTED exact duplicate
    * gives a well-defined true neighbor). The ipq CTE chain is
    * [[annIvfPqCtes]] verbatim over the augmented corpus; the truth side
    * is the ann_bruteforce cosine ranking (shared cosSql fold).
    */
  private def annRecallSql: String = {
    def qPred(a: String) = s"$a.vec_id % 10 = 0 AND $a.vec_id < 50"
    s"""WITH mx AS (SELECT max(vec_id) AS m FROM embeddings),
        corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + m + 1, embedding FROM embeddings, mx
          WHERE vec_id % 10 = 0),
        ${annIvfPqCtes("corpus", qPred("t"))},
        ipq AS (SELECT query_id, neighbor_id, adist FROM ranked),
        best AS (SELECT query_id, min(adist) AS best_adist
                 FROM ipq GROUP BY query_id),
        bf AS (
          SELECT query_id, neighbor_id AS truth_id FROM (
            SELECT eq.vec_id AS query_id, ec.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY eq.vec_id
                     ORDER BY ${QueriesLlm.cosSql("eq.embedding", "ec.embedding")} DESC,
                              ec.vec_id ASC) AS rnk
            FROM corpus eq, corpus ec
            WHERE ${qPred("eq")} AND eq.vec_id != ec.vec_id)
          WHERE rnk <= 1)
        SELECT bf.query_id, bf.truth_id,
               t.adist AS truth_adist, best.best_adist,
               coalesce(t.adist = best.best_adist, false) AS hit
        FROM bf
        LEFT JOIN ipq t ON t.query_id = bf.query_id
                       AND t.neighbor_id = bf.truth_id
        LEFT JOIN best ON best.query_id = bf.query_id"""
  }

  /** The IVF-ADC CTE chain shared by [[annIvfPqSql]] and [[annRecallSql]]
    * (ends at `ranked`: per-query ADC order). `src` is the corpus
    * relation; `qPred` selects the query rows (predicate on `t.vec_id`).
    */
  private def annIvfPqCtes(src: String = "embeddings",
                           qPred: String = s"t.vec_id < $IpqK"): String = {
    val dSub = IpqDim / IpqM
    // sequential-fold squared L2 over a subspace slice, rounded 6 — the
    // SAME fold order as Similarity's aggregate(zip_with(...))
    def subFold(a: String, b: String): String =
      s"""ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            [($a[mm.m*$dSub+i] - $b[mm.m*$dSub+i]) *
             ($a[mm.m*$dSub+i] - $b[mm.m*$dSub+i])
             for i in generate_series(1, $dSub)]),
            (acc, x) -> acc + x), 6)"""
    def fullFold(a: String, b: String): String =
      s"""ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            [($a[i] - $b[i]) * ($a[i] - $b[i])
             for i in generate_series(1, $IpqDim)]),
            (acc, x) -> acc + x), 6)"""
    s"""v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM $src),
        nn AS (SELECT GREATEST(count(*) // $IpqKc, 1) AS cstride,
                      GREATEST(count(*) // $IpqKs, 1) AS rstride
               FROM v),
        cents AS (
          SELECT CAST(vec_id // cstride AS INTEGER) AS cluster, v AS cv
          FROM v, nn
          WHERE vec_id % cstride = 0 AND vec_id // cstride < $IpqKc),
        assigned AS (
          SELECT vec_id, v, cluster, cv FROM (
            SELECT t.vec_id, t.v, c.cluster, c.cv,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY ${fullFold("t.v", "c.cv")}, c.cluster) AS r
            FROM v t, cents c)
          WHERE r = 1),
        resid AS (
          SELECT vec_id, cluster,
                 [v[i] - cv[i] for i in generate_series(1, $IpqDim)] AS rv
          FROM assigned),
        cb AS (
          SELECT CAST(vec_id // rstride AS INTEGER) AS code, rv AS cbv
          FROM resid, nn
          WHERE vec_id % rstride = 0 AND vec_id // rstride < $IpqKs),
        mm AS (SELECT unnest(generate_series(0, ${IpqM - 1})) AS m),
        enc AS (
          SELECT vec_id AS neighbor_id, cluster, m, code FROM (
            SELECT r.vec_id, r.cluster, mm.m, c.code,
                   row_number() OVER (PARTITION BY r.vec_id, mm.m
                     ORDER BY ${subFold("r.rv", "c.cbv")}, c.code) AS rr
            FROM resid r, cb c, mm)
          WHERE rr = 1),
        probes AS (
          SELECT vec_id AS query_id, v, cluster, cv FROM (
            SELECT t.vec_id, t.v, c.cluster, c.cv,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY ${fullFold("t.v", "c.cv")}, c.cluster) AS r
            FROM v t, cents c WHERE $qPred)
          WHERE r <= $IpqNprobe),
        qres AS (
          SELECT query_id, cluster,
                 [v[i] - cv[i] for i in generate_series(1, $IpqDim)] AS qr
          FROM probes),
        lut AS (
          SELECT q.query_id, q.cluster, c.code, mm.m,
                 ${subFold("q.qr", "c.cbv")} AS d
          FROM qres q, cb c, mm),
        adc AS (
          SELECT l.query_id, e.neighbor_id,
                 MIN(e.cluster) AS centroid_id,
                 CAST(SUM(CAST(d AS DECIMAL(30,6))) AS DOUBLE) AS adist
          FROM enc e
          JOIN lut l ON l.cluster = e.cluster AND l.m = e.m
                    AND l.code = e.code
          WHERE l.query_id != e.neighbor_id
          GROUP BY l.query_id, e.neighbor_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adist ASC, neighbor_id ASC) AS rnk FROM adc)"""
  }

  // ---------------------------------------------------------------- queries

  private val streamRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage the deterministic "previous crawl" snapshot the diff journeys
    * gate against: 75% of pages present (doc_id % 4 != 0), ~11% of those
    * with revised content (doc_id % 9 == 0 → " old" suffix).
    */
  private def stagePrevSnapshot(s: org.apache.spark.sql.SparkSession,
                                d: String, name: String): String = {
    // previous-crawl INPUT fixture: marker-gated on the source table's
    // pathState (Q.ensureFixture — the sink_compacted discipline), so the
    // measured work is the diff journey, not re-staging the snapshot
    val path = s"/tmp/graft_scratch/$name/docs.parquet"
    Q.ensureFixture(d, "documents", path, "prev_mod4_rev9") {
      documents(s, d).filter(pmod(col("doc_id"), lit(4)) =!= 0)
        .withColumn("text",
          when(col("doc_id") % 9 === 0, concat(col("text"), lit(" old")))
            .otherwise(col("text")))
        .write.mode("overwrite").parquet(path)
    }
  }

  private def diffYaml(prevPath: String): String =
    s"""sources:
       |  - id: docs
       |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
       |  - id: prev
       |    loader: { transport: fs, path: $prevPath, reader: { format: parquet } }
       |corpus:
       |  source: docs
       |  id: doc_id
       |  text: text
       |  steps:
       |    - { step: diff, against: prev }
       |    - { step: filter, max_repetition: 0.8 }
       |""".stripMargin

  val queries: Map[String, QueryFn] = Map(

    // Quality-aware canonical selection: within each near-dup cluster keep
    // the BEST doc by (quality desc, id asc) — the curation refinement of
    // dedup_keep's min-id rule.
    "dedup_keep_best" -> { (s, d) =>
      Dedup.keepBest(documents(s, d), "text", "doc_id",
        Text.qualityScore(col("text")))
    },

    // Deterministic two-level training-order shuffle: token-budgeted shards,
    // sha256-ratio within-shard positions, sha256-ratio shard order keys —
    // the trainer-consumable epoch order, zero RNG state.
    "shard_shuffle" -> { (s, d) =>
      Sharding.shuffleOrder(documents(s, d), "doc_id", "source",
        Text.tokenCountWs(col("text")), ShardBudget, ShuffleSeed)
        .select(col("doc_id"), col("source"), col("shard_id"),
          col("n_tokens"), col("pos"), col("shard_key"))
    },

    // The per-source corpus report card: doc/token counts, exact-decimal
    // mean quality, language spread — ONE partial-aggregated groupBy.
    "corpus_stats" -> { (s, d) =>
      val q = Text.qualityScore(col("text"))
      documents(s, d)
        .select(col("source"), col("lang"), q.as("q"),
          Text.tokenCountWs(col("text")).cast("long").as("t"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("t")).as("n_tokens"),
          round(Q.sumDec(col("q"), 6) / count(lit(1)), 6).as("mean_quality"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    },

    // Threshold calibration for the quality gate: keep counts/rates at 20
    // candidate thresholds from ONE partial-aggregated pass (20 conditional
    // sums in a single aggregate — no row explosion), unpivoted to the
    // report the gate author reads before picking min_quality.
    "quality_threshold_sweep" -> { (s, d) =>
      val q = documents(s, d).select(Text.qualityScore(col("text")).as("q"))
      val aggs = (0 until 20).map(i =>
        sum(when(col("q") >= i * 0.05, 1L).otherwise(0L)).as(s"k$i"))
      q.agg(count(lit(1)).as("n"), aggs: _*)
        .select(col("n"), posexplode(array((0 until 20).map(i =>
          struct(lit(i).as("level"), col(s"k$i").as("k"))): _*))
          .as(Seq("idx", "s")))
        .select(col("s.level").as("level"),
          (col("s.level") * lit(0.05)).cast("double").as("threshold"),
          col("s.k").as("n_kept"),
          (col("s.k").cast("double") / col("n")).as("keep_rate"))
    },

    // Crawl-generation diff: gen A = doc_id % 3 != 0, gen B = doc_id % 5
    // != 0 with a content revision planted at doc_id % 7 == 0 — every
    // status fires. The per-page status set feeds incremental planning.
    "corpus_diff" -> { (s, d) =>
      val docs = documents(s, d)
      val genA = docs.filter(col("doc_id") % 3 =!= 0)
      val genB = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" (rev)")))
            .otherwise(col("text")))
      Crawl.corpusDiff(genA, genB, "doc_id", "text")
    },

    // The declarative SERVE-ORDER journey: `corpus:` quality gate →
    // near-dup dedup with keep: best_quality (the quality-ranked canonical)
    // → shard with shuffle_seed (the deterministic epoch order) — the new
    // serving steps composed from YAML vs a fully composed oracle.
    // LENGTH-BIAS audit of the quality signal — the check that catches a
    // gate which is secretly a length filter (every heuristic quality
    // score correlates with length; the question is how much): Pearson r
    // between token count and quality per source, from ONE partial-
    // aggregated pass of exact-decimal moment sums (n, Σx, Σy, Σxy, Σx²,
    // Σy²) — source-count rows leave the shuffle, and the six moments
    // make r engine-reproducible (one IEEE expression at the end).
    "quality_length_corr" -> { (s, d) =>
      import graft.functions.Text
      val x = Text.tokenCountWs(col("text")).cast("long")
      val q = Text.qualityScore(col("text"))
      val agg = documents(s, d)
        .select(col("source"), x.as("x"), q.as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sumDec(col("y"), 6).as("sy"),
          sumDec(round(col("x") * col("y"), 6), 6).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sumDec(round(col("y") * col("y"), 6), 6).as("syy"))
      val n = col("n").cast("double")
      val num = n * col("sxy") - col("sx").cast("double") * col("sy")
      val den = sqrt(n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
        sqrt(n * col("syy") - col("sy") * col("sy"))
      agg.select(col("source"), col("n"),
        when(den === 0.0, lit(0.0)).otherwise(round(num / den, 6)).as("r"))
    },

    // Distribution DRIFT between two crawl snapshots — the monitoring
    // gate that catches a quality regression before it trains: the
    // reference slice (doc_id % 5 != 0) and the new-crawl slice (% 5 = 0)
    // histogram their quality scores into 10 fixed buckets, and each
    // bucket reports its population-stability-index term
    // (p_cur − p_ref)·ln(p_cur/p_ref) under add-1 smoothing. ONE corpus
    // scan into a 10-bucket partial aggregate; the totals are a one-row
    // broadcast; the report is bucket-count-sized at any corpus scale.
    "corpus_drift" -> { (s, d) =>
      import graft.functions.Text
      val docs = documents(s, d).select(
        least(floor(Text.qualityScore(col("text")) * 10), lit(9.0))
          .cast("int").as("bucket"),
        (pmod(col("doc_id"), lit(5)) === 0).as("cur"))
      val counts = docs.groupBy(col("bucket")).agg(
        sum(when(!col("cur"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("n_cur"))
      val totals = counts.agg(sum(col("n_ref")).as("tr"),
        sum(col("n_cur")).as("tc"))
      val spine = s.range(0, 10).select(col("id").cast("int").as("bucket"))
      val j = spine.join(counts, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        .crossJoin(broadcast(totals))
      val pr = (col("n_ref").cast("double") + 1.0) /
        (col("tr").cast("double") + 10.0)
      val pc = (col("n_cur").cast("double") + 1.0) /
        (col("tc").cast("double") + 10.0)
      j.select(col("bucket"), col("n_ref"), col("n_cur"),
        round((pc - pr) * log(pc / pr), 6).as("psi"))
    },

    // The declarative token-BUDGET journey: quality gate, then each
    // source's token budget fills greedily in sha256-ratio order at
    // bucket granularity — the `corpus:` config gains a `budget` step
    // (budget_sample's exact-histogram shape inside the journey; the
    // corpus never shuffles, the cutoff frame broadcasts back).
    "config_corpus_budget" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(
        """sources:
          |  - id: docs
          |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
          |corpus:
          |  source: docs
          |  id: doc_id
          |  text: text
          |  steps:
          |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
          |    - { step: budget, by: source, tokens: 200, buckets: 256, seed: 7 }
          |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"), col("lang"))
    },

    "config_corpus_order" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(
        """sources:
          |  - id: docs
          |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
          |corpus:
          |  source: docs
          |  id: doc_id
          |  text: text
          |  steps:
          |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
          |    - { step: dedup_fuzzy, threshold: 0.5, keep: best_quality }
          |    - { step: shard, by: source, budget: 2000, shuffle_seed: 11 }
          |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"), col("shard_id"),
          col("n_tokens"), col("pos"), col("shard_key"))
    },

    // The declarative INCREMENTAL-CRAWL journey: a staged previous
    // snapshot (75% of pages, ~11% of those with revised content) gates
    // the current crawl down to added ∪ changed pages before quality
    // filtering — the re-process-only-what-moved discipline from YAML.
    "config_corpus_diff" -> { (s, d) =>
      val prevPath = stagePrevSnapshot(s, d, "prev_crawl")
      val project = graft.pipeline.Config.parseProject(diffYaml(prevPath))
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"))
    },

    // The incremental gate AT INGEST: the previous snapshot is a static
    // side re-planned per micro-batch, so the SAME config document streams
    // — each arriving page drops immediately if its digest matches.
    "stream_corpus_diff" -> { (s, d) =>
      val prevPath = stagePrevSnapshot(s, d, "prev_crawl_stream")
      val project = graft.pipeline.Config.parseProject(diffYaml(prevPath))
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_diff_${streamRun.incrementAndGet()}")
        .select(col("doc_id"), col("source"))
    },

    // The ANN evaluation harness: recall@1 of the IVF-ADC index against
    // exact brute-force cosine ground truth on the planted-duplicate
    // corpus (the dedup_semantic precedent — the synthetic embeddings are
    // near-orthogonal, so only a planted exact duplicate gives a
    // well-defined true neighbor). What a pipeline measures before
    // trusting an approximate index at scale: truth shuffles only Q×k
    // rows (the bounded TopK aggregator), the index side is the ann_ivfpq
    // plan over the augmented corpus.
    "ann_recall" -> { (s, d) =>
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val corpus = e.unionByName(
        e.filter(pmod(col("vec_id"), lit(10)) === 0)
          .select((col("vec_id") + maxId + 1).as("vec_id"), col("embedding")))
      val q = corpus.filter(
        pmod(col("vec_id"), lit(10)) === 0 && col("vec_id") < 50)
      val truth = Similarity.annBruteForceAgg(q, corpus, "vec_id",
          "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("truth_id"))
      // hit = the true neighbor achieves the MINIMAL ADC score (tie-aware
      // recall@1 in the index metric: PQ distances quantize, so exact
      // duplicates of the codes tie — the index retrieved the truth among
      // its minimal-distance set even when the id tiebreak ranks it later)
      val adc = Similarity.annIvfPq(q, corpus, "vec_id", "embedding",
          k = Int.MaxValue, dim = IpqDim, m = IpqM, ks = IpqKs, kc = IpqKc,
          nprobe = IpqNprobe)
        .select(col("query_id"), col("neighbor_id").as("truth_id"),
          col("adist"))
      val best = adc.groupBy(col("query_id"))
        .agg(min(col("adist")).as("best_adist"))
      truth.join(adc, Seq("query_id", "truth_id"), "left")
        .join(best, Seq("query_id"), "left")
        .select(col("query_id"), col("truth_id"),
          col("adist").as("truth_adist"), col("best_adist"),
          coalesce(col("adist") === col("best_adist"), lit(false)).as("hit"))
    },

    // IVF-ADC: coarse lists + residual PQ codes + probed-list ADC scan —
    // the composed memory-bounded ANN at 100 TB.
    "ann_ivfpq" -> { (s, d) =>
      val e = embeddings(s, d)
      Similarity.annIvfPq(e.filter(col("vec_id") < IpqK), e, "vec_id",
        "embedding", k = IpqK, dim = IpqDim, m = IpqM, ks = IpqKs,
        kc = IpqKc, nprobe = IpqNprobe)
        .select(col("query_id"), col("neighbor_id"), col("centroid_id"),
          col("adist"), col("rank").as("rnk"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_keep_best" -> dedupKeepBestSql,
    "shard_shuffle" -> shardShuffleSql,
    "corpus_stats" -> corpusStatsSql,
    "corpus_diff" -> corpusDiffSql,
    "quality_threshold_sweep" -> qualitySweepSql,
    "config_corpus_diff" -> corpusDiffJourneySql,
    "stream_corpus_diff" -> corpusDiffJourneySql,
    "config_corpus_order" -> corpusOrderSql,
    "config_corpus_budget" -> corpusBudgetSql,
    "corpus_drift" -> corpusDriftSql,
    "quality_length_corr" -> qualityLengthCorrSql,
    "ann_ivfpq" -> annIvfPqSql,
    "ann_recall" -> annRecallSql
  )
}
