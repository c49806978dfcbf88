package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Dedup, Importance, Multimodal, Sharding, Similarity}
import Q._

/** Round-9 corpus-scale operators (SURVEY.md §2.7 extensions): segment-level
  * exact dedup, DSIR-style importance selection, temperature-scaled domain
  * mixing, bigram language-model scoring, product-quantized ANN, and
  * deterministic training-shard manifests. Every DuckDB oracle is generated
  * from the SAME constants as the Spark plan so the two sides cannot drift.
  */
object QueriesCorpus {

  // shared constants — the Spark plans and the oracle SQL both read these
  private val SegTokens = 10
  private val SpanGramTokens = 8
  private val DsirBuckets = 256
  private val MixSeed = 7
  private val ShardBudget = 2000L
  private val PqM = 8
  private val PqKs = 16
  private val PqDim = 64
  private val PqK = 5

  /** sha256 53-bit ratio twin (same fold as Curation.hashRatio). */
  private def ratioSql(tokenExpr: String, seed: Int): String =
    s"CAST(CAST('0x' || substr(sha256('$seed|' || CAST($tokenExpr AS VARCHAR)), 3, 14) AS BIGINT) & 9007199254740991 AS DOUBLE) / 9007199254740992.0"

  private val wordsCte =
    """words AS (
         SELECT doc_id, lang, source,
                regexp_split_to_array(lower(text), '\s+') AS w
         FROM documents)"""

  // ------------------------------------------------------------ oracle SQL

  private def substringDedupSql: String =
    s"""WITH $wordsCte,
        segs AS (
          SELECT doc_id, unnest([
            ${Text.portableHashSql(
              s"array_to_string(w[(i-1)*$SegTokens+1 : i*$SegTokens], ' ')")}
            for i in generate_series(1, len(w) // $SegTokens)]) AS h
          FROM words),
        freq AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM segs GROUP BY h),
        per AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_segments,
                 CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_segments
          FROM segs JOIN freq USING (h) GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(p.n_segments, 0) AS n_segments,
               coalesce(p.n_dup_segments, 0) AS n_dup_segments,
               ROUND(CAST(coalesce(p.n_dup_segments, 0) AS DOUBLE) /
                     GREATEST(coalesce(p.n_segments, 0), 1), 6) AS dup_fraction
        FROM documents d LEFT JOIN per p USING (doc_id)"""

  /** The span-extent twin: same k-gram hashes (portable sha-60), same
    * duplicate criterion (global count > 1), same island rule (gap iff the
    * next start exceeds previous start + k) via the gaps-and-islands
    * window idiom.
    */
  private def substringSpansSql: String = {
    val k = SpanGramTokens
    s"""WITH $wordsCte,
        g AS (
          SELECT doc_id,
                 unnest([{'p': i,
                          'h': ${Text.portableHashSql(
                            s"array_to_string(w[i : i+$k-1], ' ')")}}
                         for i in generate_series(1, len(w) - $k + 1)]) AS s
          FROM words
          WHERE len(w) >= $k),
        gp AS (SELECT doc_id, CAST(s.p AS BIGINT) AS p, s.h AS h FROM g),
        freq AS (SELECT h, count(*) AS cnt FROM gp GROUP BY h),
        dup AS (SELECT doc_id, p FROM gp JOIN freq USING (h) WHERE cnt > 1),
        isl AS (
          SELECT doc_id, p,
                 CASE WHEN lag(p) OVER w IS NULL
                        OR p > lag(p) OVER w + $k THEN 1 ELSE 0 END AS brk
          FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
        grp AS (
          SELECT doc_id, p,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp_id
          FROM isl)
        SELECT doc_id,
               CAST(min(p) AS BIGINT) AS span_start,
               CAST(max(p) + $k AS BIGINT) AS span_end,
               CAST(max(p) + $k - min(p) AS BIGINT) AS span_tokens
        FROM grp GROUP BY doc_id, grp_id"""
  }

  private def dsirSelectSql: String = {
    val b = DsirBuckets
    s"""WITH $wordsCte,
        toks AS (
          SELECT doc_id, lang = 'en' AS t,
                 CAST(${Text.portableHashSql("tok")} % $b AS INTEGER) AS bkt
          FROM (SELECT doc_id, lang, unnest(w) AS tok FROM words)),
        cnt AS (
          SELECT bkt,
                 CAST(count(*) AS BIGINT) AS raw_cnt,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tgt_cnt
          FROM toks GROUP BY bkt),
        totals AS (
          SELECT CAST(count(*) AS BIGINT) AS raw_total,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tgt_total
          FROM toks),
        lr AS (
          SELECT bkt,
                 ROUND(ln(((tgt_cnt + 1.0) * (raw_total + $b.0)) /
                          ((raw_cnt + 1.0) * (tgt_total + $b.0))), 6) AS lr
          FROM cnt, totals),
        scored AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 ROUND(CAST(SUM(CAST(lr AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*), 6) AS dsir_score
          FROM toks JOIN lr USING (bkt) GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0) AS n_tokens,
               s.dsir_score,
               coalesce(s.dsir_score, 0.0) > 0.0 AS keep
        FROM documents d LEFT JOIN scored s USING (doc_id)"""
  }

  private def domainMixSql: String =
    s"""WITH per_src AS (
          SELECT source,
                 CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                   AS n_toks
          FROM documents GROUP BY source),
        totals AS (
          SELECT CAST(SUM(n_toks) AS BIGINT) AS t_total,
                 CAST(SUM(CAST(ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6)
                               AS DECIMAL(30,6))) AS DOUBLE) AS w_total
          FROM per_src),
        rates AS (
          SELECT source,
                 ROUND(LEAST(1.0,
                   CAST(t_total AS DOUBLE) *
                     (ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6) / w_total) /
                     CAST(n_toks AS DOUBLE)), 6) AS rate
          FROM per_src, totals)
        SELECT d.doc_id, d.source, r.rate,
               ${ratioSql("d.doc_id", MixSeed)} < r.rate AS keep
        FROM documents d JOIN rates r USING (source)"""

  /** The bigram-LM scoring chain as CTEs — yields `scored(doc_id,
    * n_bigrams, mean_logprob)` for documents with ≥ 1 bigram. Shared by
    * the bigram_logprob and perplexity_bucket oracles.
    */
  private def bigramLogprobCtes: String =
    s"""$wordsCte,
        bigrams AS (
          SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
            for i in generate_series(1, len(w) - 1)]) AS bg
          FROM words),
        bcnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS bc
                 FROM bigrams GROUP BY bg),
        ucnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS uc FROM
                   (SELECT unnest(w) AS tok FROM words) GROUP BY tok),
        scored AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_bigrams,
                 ROUND(CAST(SUM(CAST(ROUND(ln(CAST(bc AS DOUBLE) / uc), 6)
                                     AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*), 6) AS mean_logprob
          FROM (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prefix
                FROM bigrams)
          JOIN bcnt USING (bg)
          JOIN ucnt ON tok = prefix
          GROUP BY doc_id)"""

  private def bigramLogprobSql: String =
    s"""WITH $bigramLogprobCtes
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               s.mean_logprob
        FROM documents d LEFT JOIN scored s USING (doc_id)"""

  /** Tertile thresholds from the grid-bounded score histogram (the same
    * integer-division rank cutoffs the Spark driver walk computes), then a
    * pure per-row CASE.
    */
  private def perplexityBucketSql: String =
    s"""WITH $bigramLogprobCtes,
        blp AS (
          SELECT d.doc_id, s.mean_logprob
          FROM documents d LEFT JOIN scored s USING (doc_id)),
        sc AS (SELECT mean_logprob FROM blp WHERE mean_logprob IS NOT NULL),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc),
        hist AS (SELECT mean_logprob, CAST(count(*) AS BIGINT) AS c
                 FROM sc GROUP BY 1),
        cum AS (SELECT mean_logprob,
                       SUM(c) OVER (ORDER BY mean_logprob) AS cc
                FROM hist),
        t1 AS (SELECT min(mean_logprob) AS v FROM cum, nn
               WHERE cc >= (n + 2) // 3),
        t2 AS (SELECT min(mean_logprob) AS v FROM cum, nn
               WHERE cc >= (2 * n + 2) // 3)
        SELECT b.doc_id, b.mean_logprob,
               CASE WHEN b.mean_logprob IS NULL THEN 'unscored'
                    WHEN b.mean_logprob > (SELECT v FROM t2) THEN 'head'
                    WHEN b.mean_logprob > (SELECT v FROM t1) THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM blp b"""

  private def shardManifestSql: String =
    s"""WITH toked AS (
          SELECT doc_id, source, text,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens
          FROM documents),
        assigned AS (
          SELECT doc_id, source, text, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $ShardBudget AS BIGINT) AS shard_id
          FROM toked)
        SELECT source, shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id,
               bit_xor(${Text.portableHashSql("text")}) AS digest
        FROM assigned GROUP BY source, shard_id"""

  private def annPqSql: String = {
    val dSub = PqDim / PqM
    def foldSql(a: String, b: String): String =
      s"""ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            [($a[mm.m*$dSub+i] - $b[mm.m*$dSub+i]) *
             ($a[mm.m*$dSub+i] - $b[mm.m*$dSub+i])
             for i in generate_series(1, $dSub)]),
            (acc, x) -> acc + x), 6)"""
    s"""WITH v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings),
        nn AS (SELECT GREATEST(count(*) // $PqKs, 1) AS stride FROM v),
        cb AS (
          SELECT CAST(vec_id // stride AS INTEGER) AS code, v
          FROM v, nn
          WHERE vec_id % stride = 0 AND vec_id // stride < $PqKs),
        mm AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
        enc AS (
          SELECT vec_id AS neighbor_id, m, code FROM (
            SELECT t.vec_id, mm.m, c.code,
                   row_number() OVER (PARTITION BY t.vec_id, mm.m
                     ORDER BY ${foldSql("t.v", "c.v")}, c.code) AS r
            FROM v t, cb c, mm)
          WHERE r = 1),
        lut AS (
          SELECT q.vec_id AS query_id, mm.m, c.code,
                 ${foldSql("q.v", "c.v")} AS d
          FROM v q, cb c, mm
          WHERE q.vec_id < 5),
        adc AS (
          SELECT query_id, neighbor_id,
                 CAST(SUM(CAST(d AS DECIMAL(30,6))) AS DOUBLE) AS adist
          FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code
          WHERE l.query_id != e.neighbor_id
          GROUP BY query_id, neighbor_id)
        SELECT query_id, neighbor_id, adist, rnk
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adist ASC, neighbor_id ASC) AS rnk FROM adc)
        WHERE rnk <= $PqK"""
  }

  // ---------------------------------------------- the serve config journey

  /** langId as a CASE over the SAME marker tables as Text.langId. */
  private def occSql(m: String, rel: String): String =
    s"(length($rel.text) - length(replace($rel.text, '$m', ''))) / ${m.length}"

  private def langIdCaseSql(rel: String): String = {
    val scores = Text.LangPriority.map(l =>
      l -> Text.LangMarkers.toMap.apply(l).map(occSql(_, rel)).mkString(" + "))
    val m = scores.map(_._2).map(s => s"($s)").mkString("greatest(", ", ", ")")
    val cases = scores.dropRight(1)
      .map { case (l, s) => s"WHEN ($s) = $m THEN '$l'" }.mkString(" ")
    s"(CASE $cases ELSE '${Text.LangPriority.last}' END)"
  }

  /** repetitionRatio twin on a (doc_id, text) relation. */
  private[queries] def repSql(rel: String): String =
    s"""ROUND(1.0 - CAST(len(list_distinct(regexp_split_to_array(lower($rel.text), '\\s+'))) AS DOUBLE) /
        CAST(GREATEST(len(regexp_split_to_array(lower($rel.text), '\\s+')), 1) AS DOUBLE), 6)"""

  /** The dense DSIR model + per-doc score CTEs over `src` (a (doc_id, text)
    * relation): target = langId(text) == 'en', `b` hashed buckets, add-one
    * smoothing, decimal-exact mean log-ratio — mirrors Importance.dsirModel
    * + dsirScoreExpr (the fold's decimal sum equals the groupBy decimal
    * sum exactly). Yields `dscored(doc_id, dsir_score)`.
    */
  private def dsirModelCtes(src: String, b: Int): String =
    s"""dwords AS (
          SELECT doc_id, regexp_split_to_array(lower($src.text), '\\s+') AS w,
                 ${langIdCaseSql(src)} = 'en' AS t
          FROM $src),
        dtoks AS (
          SELECT doc_id, t,
                 CAST(${Text.portableHashSql("tok")} % $b AS INTEGER) AS bkt
          FROM (SELECT doc_id, t, unnest(w) AS tok FROM dwords)),
        dcnt AS (
          SELECT bkt,
                 CAST(count(*) AS BIGINT) AS raw_cnt,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tgt_cnt
          FROM dtoks GROUP BY bkt),
        dtot AS (
          SELECT CAST(count(*) AS BIGINT) AS raw_total,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tgt_total
          FROM dtoks),
        dspine AS (SELECT unnest(generate_series(0, ${b - 1})) AS bkt),
        dlr AS (
          SELECT s.bkt,
                 ROUND(ln(((coalesce(c.tgt_cnt, 0) + 1.0) * (raw_total + $b.0)) /
                          ((coalesce(c.raw_cnt, 0) + 1.0) * (tgt_total + $b.0))),
                   6) AS lr
          FROM dspine s LEFT JOIN dcnt c USING (bkt) CROSS JOIN dtot),
        dscored AS (
          SELECT doc_id,
                 ROUND(CAST(SUM(CAST(lr AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*), 6) AS dsir_score
          FROM dtoks JOIN dlr USING (bkt) GROUP BY doc_id)"""

  /** The declarative serve journey: quality gate → DSIR selection (model
    * trained on the curated frame, scored under the hydrated artifact) →
    * domain mixture → token-budgeted shards.
    */
  private def configCorpusServeSql: String =
    s"""WITH kept0 AS (
          SELECT d.doc_id, d.source, d.text FROM documents d
          WHERE ${repSql("d")} <= 0.8),
        ${dsirModelCtes("kept0", DsirBuckets)},
        kept1 AS (
          SELECT k.doc_id, k.source, k.text, s.dsir_score
          FROM kept0 k JOIN dscored s USING (doc_id)
          WHERE s.dsir_score > 0.0),
        per_src AS (
          SELECT source,
                 CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                   AS n_toks
          FROM kept1 GROUP BY source),
        mtot AS (
          SELECT CAST(SUM(n_toks) AS BIGINT) AS t_total,
                 CAST(SUM(CAST(ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6)
                               AS DECIMAL(30,6))) AS DOUBLE) AS w_total
          FROM per_src),
        rates AS (
          SELECT source,
                 ROUND(LEAST(1.0,
                   CAST(t_total AS DOUBLE) *
                     (ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6) / w_total) /
                     CAST(n_toks AS DOUBLE)), 6) AS rate
          FROM per_src, mtot),
        kept2 AS (
          SELECT k.doc_id, k.source, k.text, k.dsir_score
          FROM kept1 k JOIN rates r USING (source)
          WHERE ${ratioSql("k.doc_id", MixSeed)} < r.rate),
        assigned AS (
          SELECT doc_id, source, dsir_score,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens,
                 CAST(coalesce(SUM(CAST(len(regexp_extract_all(text, '\\S+'))
                     AS BIGINT)) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $ShardBudget AS BIGINT) AS shard_id
          FROM kept2)
        SELECT doc_id, source, dsir_score, n_tokens, shard_id FROM assigned"""

  /** multimodal_phash twin: the dHash recomputed straight off the payload
    * bytes (ascii(char) == luma byte on the ASCII corpus — the audio/video
    * precedent), then the same 14-bit band buckets and exact-copy counts.
    * The planted duplicates (every 10th doc re-attached past max id) give
    * the banding real collisions to count.
    */
  private def multimodalPhashSql: String = {
    val g = Multimodal.PhashGrid
    val bits = Multimodal.PhashBits
    val bandBits = Multimodal.PhashBandBits
    val mask = Multimodal.PhashBandMask
    s"""WITH maxid AS (SELECT max(doc_id) AS m FROM documents),
        corpus AS (
          SELECT doc_id AS media_id, text FROM documents
          UNION ALL
          SELECT doc_id + m + 1 AS media_id, text
          FROM documents, maxid WHERE doc_id % 10 = 0),
        px AS (
          SELECT media_id,
                 [CASE WHEN length(text) = 0 THEN 0
                       ELSE ascii(substr(text, ((i - 1) % length(text)) + 1, 1))
                  END for i in generate_series(1, ${g * g})] AS p
          FROM corpus),
        hashed AS (
          SELECT media_id,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [CASE WHEN p[(i // ${g - 1}) * $g + (i % ${g - 1}) + 1] >
                              p[(i // ${g - 1}) * $g + (i % ${g - 1}) + 2]
                         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT)
                    END for i in generate_series(0, ${bits - 1})]),
                   (acc, x) -> acc + x) AS BIGINT) AS phash
          FROM px),
        ex AS (SELECT phash, count(*) AS c FROM hashed GROUP BY phash),
        banded AS (
          SELECT media_id, phash, b, (phash >> (b * $bandBits)) & $mask AS bv
          FROM hashed, (SELECT unnest(generate_series(0, ${Multimodal.PhashBands - 1})) AS b) bs),
        buckets AS (SELECT b, bv, count(*) AS n FROM banded GROUP BY b, bv)
        SELECT c.media_id, c.phash, c.n_candidates,
               CAST(e.c - 1 AS BIGINT) AS n_exact
        FROM (SELECT media_id, phash, CAST(SUM(n - 1) AS BIGINT) AS n_candidates
              FROM banded JOIN buckets USING (b, bv)
              GROUP BY media_id, phash) c
        JOIN ex e USING (phash)"""
  }

  /** multimodal_video_dedup twin: ascii(char) == luma byte on the ASCII
    * corpus (buildY4m's planes are the text bytes, zero-padded); frame f
    * of the 8×4 geometry covers text positions f·32+1 .. min((f+1)·32,
    * len) (padding sums 0), every 2nd frame samples, and the sampled
    * sums fold through the doc_fingerprint polynomial chain.
    */
  private def multimodalVideoDedupSql: String = {
    val fb = Multimodal.VideoWidth * Multimodal.VideoHeight
    val stride = Multimodal.VideoSampleStride
    s"""WITH maxid AS (SELECT max(doc_id) AS m FROM documents),
        corpus AS (
          SELECT doc_id AS media_id, text FROM documents
          UNION ALL
          SELECT doc_id + m + 1 AS media_id, text
          FROM documents, maxid WHERE doc_id % 10 = 0),
        fr AS (
          SELECT media_id,
                 CAST(greatest(1, ceil(length(text) / $fb.0)) AS BIGINT)
                   AS nf,
                 [list_reduce(list_prepend(CAST(0 AS BIGINT),
                    [CAST(ascii(text[j]) AS BIGINT)
                     for j in generate_series(f * $fb + 1,
                       least((f + 1) * $fb, length(text)))]),
                    (acc, x) -> acc + x)
                  for f in generate_series(0,
                    CAST(greatest(1, ceil(length(text) / $fb.0)) AS INTEGER) - 1)
                  if f % $stride = 0] AS sums
          FROM corpus),
        hashed AS (
          SELECT media_id, nf AS n_frames,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), sums),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS vfp
          FROM fr),
        ex AS (SELECT vfp, count(*) AS c FROM hashed GROUP BY vfp)
        SELECT h.media_id, h.n_frames, h.vfp,
               CAST(e.c - 1 AS BIGINT) AS n_exact
        FROM hashed h JOIN ex e USING (vfp)"""
  }

  /** multimodal_audio_dedup twin: ascii(char) == PCM sample byte on the
    * ASCII corpus (the 8-bit passthrough is lossless); window i of W=57
    * covers text positions ((i·len)//W + 1 .. ((i+1)·len)//W), bit i
    * compares adjacent window energies cross-multiplied by lengths
    * (integer-exact); banding shared with the phash twin.
    */
  private def multimodalAudioDedupSql: String = {
    val w = Multimodal.AudioFpWindows
    val bits = Multimodal.PhashBits
    val bandBits = Multimodal.PhashBandBits
    val mask = Multimodal.PhashBandMask
    s"""WITH maxid AS (SELECT max(doc_id) AS m FROM documents),
        corpus AS (
          SELECT doc_id AS media_id, text FROM documents
          UNION ALL
          SELECT doc_id + m + 1 AS media_id, text
          FROM documents, maxid WHERE doc_id % 10 = 0),
        ws AS (
          SELECT media_id,
                 [list_reduce(list_prepend(CAST(0 AS BIGINT),
                    [CAST(ascii(text[j]) AS BIGINT)
                     for j in generate_series(
                       (i * length(text)) // $w + 1,
                       ((i + 1) * length(text)) // $w)]),
                    (acc, x) -> acc + x)
                  for i in generate_series(0, ${w - 1})] AS s,
                 [((i + 1) * length(text)) // $w - (i * length(text)) // $w
                  for i in generate_series(0, ${w - 1})] AS l
          FROM corpus),
        hashed AS (
          SELECT media_id,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [CASE WHEN s[i + 2] * l[i + 1] > s[i + 1] * l[i + 2]
                         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT)
                    END for i in generate_series(0, ${bits - 1})]),
                   (acc, x) -> acc + x) AS BIGINT) AS afp
          FROM ws),
        ex AS (SELECT afp, count(*) AS c FROM hashed GROUP BY afp),
        banded AS (
          SELECT media_id, afp, b, (afp >> (b * $bandBits)) & $mask AS bv
          FROM hashed, (SELECT unnest(generate_series(0, ${Multimodal.PhashBands - 1})) AS b) bs),
        buckets AS (SELECT b, bv, count(*) AS n FROM banded GROUP BY b, bv)
        SELECT c.media_id, c.afp, c.n_candidates,
               CAST(e.c - 1 AS BIGINT) AS n_exact
        FROM (SELECT media_id, afp, CAST(SUM(n - 1) AS BIGINT) AS n_candidates
              FROM banded JOIN buckets USING (b, bv)
              GROUP BY media_id, afp) c
        JOIN ex e USING (afp)"""
  }

  /** Streaming select: the quality gate + importance gate at ingest under a
    * model trained batch-side on the FULL corpus.
    */
  private def streamCorpusSelectSql: String =
    s"""WITH ${dsirModelCtes("documents", DsirBuckets)}
        SELECT d.doc_id, s.dsir_score
        FROM documents d JOIN dscored s USING (doc_id)
        WHERE ${repSql("d")} <= 0.8 AND s.dsir_score > 0.0"""

  /** The Bloom-decontamination journey: quality gate → per-row bitmap
    * probe, survivors only. Bitmap replay shared with decontam_bloom
    * (QueriesCuration.bloomDecontamCtes) so the hash family cannot drift.
    * The stream twin runs the identical per-row chain, so one builder
    * serves both.
    */
  private def corpusDecontamSql: String =
    s"""WITH kept0 AS (
          SELECT d.doc_id, d.source, d.text FROM documents d
          WHERE ${repSql("d")} <= 0.8),
        ${QueriesCuration.bloomDecontamCtes("kept0")}
        SELECT k.doc_id, k.source
        FROM kept0 k LEFT JOIN bl_hit h USING (doc_id)
        WHERE coalesce(h.n_flagged, 0) = 0"""

  /** The CAPSTONE journey oracle: quality gate → min-id exact dedup →
    * Bloom decontamination → trained-classifier gate → sqrt-temperature
    * domain mixture → token-budgeted shards, each stage the SAME shared
    * builder its standalone oracle uses (bloomDecontamCtes, logRegCtes,
    * the serve journey's rate/shard SQL) — composition is the only new
    * code, so no stage can drift from its standalone twin.
    */
  private def corpusFullSql: String = {
    val sig = QueriesCuration.hardSigmoidSql("s.s")
    s"""WITH kept0 AS (
          SELECT d.doc_id, d.source, d.text FROM documents d
          WHERE ${repSql("d")} <= 0.8),
        kept1 AS (
          SELECT k.doc_id, k.source, k.text FROM kept0 k
          JOIN (SELECT text, min(doc_id) AS doc_id
                FROM kept0 GROUP BY text) m ON k.doc_id = m.doc_id),
        ${QueriesCuration.bloomDecontamCtes("kept1")},
        kept2 AS (
          SELECT k.doc_id, k.source, k.text
          FROM kept1 k LEFT JOIN bl_hit h USING (doc_id)
          WHERE coalesce(h.n_flagged, 0) = 0),
        ${QueriesCuration.logRegCtes(QueriesCuration.ClsBuckets,
          QueriesCuration.ClsIters, QueriesCuration.ClsEta,
          rel = "kept2", labelSql = clsLabelSql("kept2"))},
        kept3 AS (
          SELECT k.doc_id, k.source, k.text, $sig AS quality_prob
          FROM kept2 k JOIN cls_sF s USING (doc_id)
          WHERE $sig >= 0.5),
        per_src AS (
          SELECT source,
                 CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                   AS n_toks
          FROM kept3 GROUP BY source),
        mtot AS (
          SELECT CAST(SUM(n_toks) AS BIGINT) AS t_total,
                 CAST(SUM(CAST(ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6)
                               AS DECIMAL(30,6))) AS DOUBLE) AS w_total
          FROM per_src),
        rates AS (
          SELECT source,
                 ROUND(LEAST(1.0,
                   CAST(t_total AS DOUBLE) *
                     (ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6) / w_total) /
                     CAST(n_toks AS DOUBLE)), 6) AS rate
          FROM per_src, mtot),
        kept4 AS (
          SELECT k.doc_id, k.source, k.text, k.quality_prob
          FROM kept3 k JOIN rates r USING (source)
          WHERE ${ratioSql("k.doc_id", MixSeed)} < r.rate),
        assigned AS (
          SELECT doc_id, source, quality_prob,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens,
                 CAST(coalesce(SUM(CAST(len(regexp_extract_all(text, '\\S+'))
                     AS BIGINT)) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // $ShardBudget AS BIGINT) AS shard_id
          FROM kept4)
        SELECT doc_id, source, quality_prob, n_tokens, shard_id
        FROM assigned"""
  }

  /** The composed curation stream: gate + bitmap probe + classifier prob,
    * three per-row conditions over the full-corpus-trained model and the
    * %17 benchmark bitmap — shared builders end to end.
    */
  private def streamCorpusCurateSql: String = {
    val sig = QueriesCuration.hardSigmoidSql("s.s")
    s"""WITH ${QueriesCuration.bloomDecontamCtes("documents")},
        ${QueriesCuration.logRegCtes(QueriesCuration.ClsBuckets,
          QueriesCuration.ClsIters, QueriesCuration.ClsEta,
          rel = "documents", labelSql = clsLabelSql("documents"))}
        SELECT d.doc_id, d.source, $sig AS quality_prob
        FROM documents d
        LEFT JOIN bl_hit h USING (doc_id)
        JOIN cls_sF s USING (doc_id)
        WHERE ${repSql("d")} <= 0.8
          AND coalesce(h.n_flagged, 0) = 0
          AND $sig >= 0.5"""
  }

  /** Stream mix twin: rates fit over the FULL corpus, the gate is the
    * filter prefix + the sha256-ratio threshold under those rates — the
    * same rate CTEs as the serve journey, over documents.
    */
  private def streamCorpusMixSql: String =
    s"""WITH per_src AS (
          SELECT source,
                 CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                   AS n_toks
          FROM documents GROUP BY source),
        mtot AS (
          SELECT CAST(SUM(n_toks) AS BIGINT) AS t_total,
                 CAST(SUM(CAST(ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6)
                               AS DECIMAL(30,6))) AS DOUBLE) AS w_total
          FROM per_src),
        rates AS (
          SELECT source,
                 ROUND(LEAST(1.0,
                   CAST(t_total AS DOUBLE) *
                     (ROUND(sqrt(CAST(n_toks AS DOUBLE)), 6) / w_total) /
                     CAST(n_toks AS DOUBLE)), 6) AS rate
          FROM per_src, mtot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r USING (source)
        WHERE ${repSql("d")} <= 0.8
          AND ${ratioSql("d.doc_id", MixSeed)} < r.rate"""

  /** Label twin of the classify step's langId(text) == 'en' training rule. */
  private def clsLabelSql(rel: String): String =
    s"CASE WHEN ${langIdCaseSql(rel)} = 'en' THEN 1.0 ELSE 0.0 END"

  /** The learned-gate journey: quality gate → classifier trained on the
    * CURATED frame (the batch train-if-missing path), scored and gated at
    * min_prob. Training replay shared with quality_classifier
    * (QueriesCuration.logRegCtes) so arithmetic cannot drift.
    */
  private def configCorpusClassifySql: String = {
    val sig = QueriesCuration.hardSigmoidSql("s.s")
    s"""WITH kept0 AS (
          SELECT d.doc_id, d.source, d.text FROM documents d
          WHERE ${repSql("d")} <= 0.8),
        ${QueriesCuration.logRegCtes(QueriesCuration.ClsBuckets,
          QueriesCuration.ClsIters, QueriesCuration.ClsEta,
          rel = "kept0", labelSql = clsLabelSql("kept0"))}
        SELECT k.doc_id, k.source, $sig AS quality_prob
        FROM kept0 k JOIN cls_sF s USING (doc_id)
        WHERE $sig >= 0.5"""
  }

  /** Stream twin: the model trains batch-side on the FULL corpus, the
    * stream applies gate + hydrated-model scoring per row.
    */
  private def streamCorpusClassifySql: String = {
    val sig = QueriesCuration.hardSigmoidSql("s.s")
    s"""WITH ${QueriesCuration.logRegCtes(QueriesCuration.ClsBuckets,
          QueriesCuration.ClsIters, QueriesCuration.ClsEta,
          rel = "documents", labelSql = clsLabelSql("documents"))}
        SELECT d.doc_id, $sig AS quality_prob
        FROM documents d JOIN cls_sF s USING (doc_id)
        WHERE ${repSql("d")} <= 0.8 AND $sig >= 0.5"""
  }

  // --------------------------------------------------------------- queries

  /** Per-doc bigram-LM score frame `(doc_id, n_bigrams, mean_logprob)` —
    * shared by bigram_logprob and perplexity_bucket so the LM arithmetic
    * cannot drift. The fit lives in operators/BigramLm; it runs ONCE per
    * corpus behind a train-if-missing parquet artifact (fingerprint-keyed,
    * the Importance.saveRates / bpe_artifact discipline) because both heads
    * consume the identical frame and the fit is ~the whole cost of each.
    */
  private def bigramScores(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.operators.BigramLm.scoresArtifact(s, documents(s, d), "doc_id",
      "text", s"$d/documents.parquet", "/tmp/graft_scratch/bigram_lm")

  val queries: Map[String, QueryFn] = Map(
    "substring_dedup" -> { (s, d) =>
      Dedup.segmentDedup(documents(s, d), "text", "doc_id", SegTokens)
    },

    // Duplicated-span EXTENTS (Lee et al. 2021 at k-gram granularity):
    // every token position is tested, duplicated positions merge into
    // maximal (start, end) extents per doc — the fine-grained report
    // substring_dedup's coarse blocks approximate. Hashes+positions
    // shuffle, bodies don't; the island merge is a per-row HOF fold.
    "substring_spans" -> { (s, d) =>
      Dedup.substringSpans(documents(s, d), "doc_id", "text", SpanGramTokens)
    },

    "dsir_select" -> { (s, d) =>
      Importance.dsirScores(documents(s, d), "doc_id", "text",
        col("lang") === "en", DsirBuckets)
    },

    "domain_mix" -> { (s, d) =>
      Importance.domainMix(documents(s, d), "doc_id", "source",
        Text.tokenCountWs(col("text")), MixSeed)
    },

    // Bigram language-model scoring (the next-order quality signal after
    // unigram_logprob): per-doc mean log P(w_i | w_{i-1}) under corpus
    // bigram/unigram maximum-likelihood counts. The unigram table is
    // vocabulary-bounded (broadcast); bigram counts partial-aggregate and
    // join keyed on the bigram — no unbounded state.
    "bigram_logprob" -> { (s, d) =>
      bigramScores(s, d)
        .select(col("doc_id"), col("n_bigrams"), col("mean_logprob"))
    },

    // CCNet-style perplexity bucketing: the corpus partitions into
    // head/middle/tail TERTILES by bigram-LM score (head = most fluent
    // third — the slice CCNet keeps preferentially). Thresholds come from
    // an exact histogram over the round-6 score values — bounded by the
    // DECIMAL GRID, not the row count — but that grid is score-range × 1e6,
    // which can reach millions of rows: too big for a driver hop. So the
    // tertile walk stays DISTRIBUTED (the curation_skyline / quality_rrf
    // level-table discipline): a cumsum window over the level table picks
    // the two threshold scores, which collapse to ONE broadcast row the
    // assignment attaches as a plan literal. Ties share a score value and
    // land in one bucket — the deterministic value-threshold semantics
    // both engines reproduce exactly.
    "perplexity_bucket" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // the artifact read IS the stable materialization — no checkpoint
      val blp = bigramScores(s, d)
      val levels = blp.filter(col("mean_logprob").isNotNull)
        .groupBy(col("mean_logprob")).agg(count(lit(1)).as("c"))
      // cum over ascending score (single-partition window is fine: the
      // frame is the grid-bounded LEVEL table, never the corpus)
      val wCum = Window.orderBy(col("mean_logprob"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val walked = levels
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
      // t1 = first level with cum >= ceil(n/3); t2 = first with cum >=
      // ceil(2n/3) — exactly the old driver walk's (n+2)/3, (2n+2)/3.
      // floor(): Spark's `/` on longs is DOUBLE division; the driver walk
      // used integer (n+2)/3, and for nonnegative n floor matches it.
      val thresholds = walked.agg(
        min(when(col("cum") >= floor((col("n") + 2) / 3),
          col("mean_logprob"))).as("t1"),
        min(when(col("cum") >= floor((col("n") * 2 + 2) / 3),
          col("mean_logprob"))).as("t2"))
      blp.crossJoin(broadcast(thresholds))
        .withColumn("bucket",
          when(col("mean_logprob").isNull, lit("unscored"))
            .when(col("mean_logprob") > col("t2"), lit("head"))
            .when(col("mean_logprob") > col("t1"), lit("middle"))
            .otherwise(lit("tail")))
        .select(col("doc_id"), col("mean_logprob"), col("bucket"))
    },

    "shard_manifest" -> { (s, d) =>
      Sharding.manifest(documents(s, d), "doc_id", "source", "text",
        Text.tokenCountWs(col("text")), ShardBudget)
    },

    // Shard-balance report over the manifest — the serving check a
    // trainer runs before an epoch (badly balanced shards starve data
    // loaders): per source, shard count, token min/max/mean and the
    // min/max balance ratio. An aggregate OF the shard-count-sized
    // manifest — metadata-scale however large the corpus.
    "shard_balance" -> { (s, d) =>
      Sharding.manifest(documents(s, d), "doc_id", "source", "text",
        Text.tokenCountWs(col("text")), ShardBudget)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_shards"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6)
            .as("mean_tokens"),
          round(min(col("n_tokens")).cast("double") /
            max(col("n_tokens")).cast("double"), 6).as("balance"))
    },

    "ann_pq" -> { (s, d) =>
      val e = embeddings(s, d)
      Similarity.annPq(e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
        k = PqK, dim = PqDim, m = PqM, ks = PqKs)
        .select(col("query_id"), col("neighbor_id"), col("adist"),
          col("rank").as("rnk"))
    },

    // The declarative SERVE journey: quality gate → DSIR importance
    // selection (model trained on the curated frame, persisted as a JSON
    // artifact, scored under the HYDRATED copy) → temperature-scaled
    // domain mixture → token-budgeted shard assignment — the config
    // surface that takes a crawl to trainer-ready shards in one
    // materialize. The artifact is cleared first so every invocation
    // proves the full train→save→hydrate→score round trip.
    "config_corpus_serve" -> { (s, d) =>
      val art = "/tmp/graft_scratch/serve_dsir/model.json"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(art))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  id: doc_id
           |  text: text
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: select, target_lang: en, buckets: $DsirBuckets, min_score: 0.0, artifact: $art }
           |    - { step: mix, by: source, seed: $MixSeed }
           |    - { step: shard, by: source, budget: $ShardBudget }
           |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"), col("dsir_score"),
          col("n_tokens"), col("shard_id"))
    },

    // Image near-dup detection over the REAL PNG codec round trip: payloads
    // paint 8x8 grayscale thumbnails, encode/decode through javax.imageio,
    // dHash over the DECODED pixels, 14-bit band buckets count near-dup
    // candidates. Planted copies (every 10th doc past max id) exercise the
    // exact-copy path, the semanticCorpus discipline.
    "multimodal_phash" -> { (s, d) =>
      val docs = documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
      Multimodal.phashDedup(s,
        Multimodal.asMediaTable(corpus, "doc_id", "text"))
    },

    // Audio-fingerprint dedup over a real WAV container round trip: the
    // decoded PCM's 57-window energy envelope hashes into 56 bits, 14-bit
    // band buckets count near-dup candidates + exact copies — the
    // thumbnail-dedup discipline applied to an audio corpus. Planted
    // copies (every 10th doc past max id) exercise the exact-copy path.
    "multimodal_audio_dedup" -> { (s, d) =>
      val docs = documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
      Multimodal.audioDedup(s,
        Multimodal.asMediaTable(corpus, "doc_id", "text"))
    },

    // Video frame-envelope dedup completing the image/audio/video dedup
    // triple: each clip round-trips through the real y4m container parse,
    // the sampled frames' luma sums fold into a polynomial fingerprint
    // (container metadata never enters — re-muxed copies collide), and
    // clips report their exact-envelope copy count. Fingerprints shuffle;
    // decoded frames never do. Planted copies (every 10th doc past max
    // id) exercise the copy path.
    "multimodal_video_dedup" -> { (s, d) =>
      val docs = documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
      Multimodal.videoDedup(s,
        Multimodal.asMediaTable(corpus, "doc_id", "text"))
    },

    // The declarative Bloom-DECONTAMINATION journey: quality gate →
    // decontaminate(method: bloom) — the benchmark (a staged parquet
    // source, every 17th document) collapses into its 64Kbit bitmap at
    // plan build and the gate is one per-row probe: no corpus shuffle, no
    // join, the large-benchmark posture on the config surface.
    "config_corpus_decontam" -> { (s, d) =>
      // benchmark-suite INPUT fixture: marker-gated on the source table's
      // pathState (Q.ensureFixture — the sink_compacted discipline), so
      // the measured work is the journey, not re-staging an identical
      // fixture every pass
      val benchPath = Q.ensureFixture(d, "documents",
        "/tmp/graft_scratch/bench_decontam/docs.parquet", "mod17") {
        documents(s, d).filter(pmod(col("doc_id"), lit(17)) === 0)
          .write.mode("overwrite")
          .parquet("/tmp/graft_scratch/bench_decontam/docs.parquet")
      }
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |  - id: bench
           |    loader: { transport: fs, path: $benchPath, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  id: doc_id
           |  text: text
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: decontaminate, benchmark: bench, ngram: 3, method: bloom }
           |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"))
    },

    // Benchmark decontamination AT INGEST: because the Bloom method's gate
    // is a pure per-row probe of a plan-literal bitmap, the SAME config
    // document streams — each arriving doc is gated against the benchmark
    // with zero state (method: exact is rejected by name on the stream).
    "stream_corpus_decontam" -> { (s, d) =>
      // marker-gated benchmark fixture (see config_corpus_decontam)
      val benchPath = Q.ensureFixture(d, "documents",
        "/tmp/graft_scratch/bench_stream_decontam/docs.parquet", "mod17") {
        documents(s, d).filter(pmod(col("doc_id"), lit(17)) === 0)
          .write.mode("overwrite")
          .parquet("/tmp/graft_scratch/bench_stream_decontam/docs.parquet")
      }
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |  - id: bench
           |    loader: { transport: fs, path: $benchPath, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: decontaminate, benchmark: bench, ngram: 3, method: bloom }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_decontam_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("source"))
    },

    // The CAPSTONE journey: one `corpus:` document takes a raw corpus to
    // trainer-ready shards through SIX composed stages — quality gate →
    // exact dedup → Bloom decontamination (staged benchmark source) →
    // trained-classifier gate (train-if-missing JSON artifact) →
    // sqrt-temperature domain mixture → token-budgeted shard assignment.
    // Every stage is the same implementation its standalone query gates,
    // and the oracle composes the same shared builders — the proof that
    // the declarative surface COMPOSES, not just that each step works.
    "config_corpus_full" -> { (s, d) =>
      // marker-gated benchmark fixture (see config_corpus_decontam)
      val benchPath = Q.ensureFixture(d, "documents",
        "/tmp/graft_scratch/bench_full/docs.parquet", "mod17") {
        documents(s, d).filter(pmod(col("doc_id"), lit(17)) === 0)
          .write.mode("overwrite")
          .parquet("/tmp/graft_scratch/bench_full/docs.parquet")
      }
      val art = "/tmp/graft_scratch/full_classify/model.json"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(art))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |  - id: bench
           |    loader: { transport: fs, path: $benchPath, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  id: doc_id
           |  text: text
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: dedup_exact }
           |    - { step: decontaminate, benchmark: bench, ngram: 3, method: bloom }
           |    - { step: classify, target_lang: en, buckets: ${QueriesCuration.ClsBuckets}, iters: ${QueriesCuration.ClsIters}, eta: ${QueriesCuration.ClsEta.toInt}, min_prob: 0.5, artifact: $art }
           |    - { step: mix, by: source, seed: $MixSeed }
           |    - { step: shard, by: source, budget: $ShardBudget }
           |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"), col("quality_prob"),
          col("n_tokens"), col("shard_id"))
    },

    // The declarative LEARNED-GATE journey: quality gate → trained
    // classifier (hashed-feature logistic regression fitted on the curated
    // frame, persisted as a JSON artifact, scored under the HYDRATED copy
    // as a pure per-row fold). The artifact is cleared first so every
    // invocation proves the full train→save→hydrate→score round trip.
    "config_corpus_classify" -> { (s, d) =>
      val art = "/tmp/graft_scratch/classify_lr/model.json"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(art))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  id: doc_id
           |  text: text
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: classify, target_lang: en, buckets: ${QueriesCuration.ClsBuckets}, iters: ${QueriesCuration.ClsIters}, eta: ${QueriesCuration.ClsEta.toInt}, min_prob: 0.5, artifact: $art }
           |""".stripMargin)
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("source"), col("quality_prob"))
    },

    // The learned quality gate AT INGEST: the classifier trains batch-side
    // once (train once, every crawl streams through it), then the streaming
    // corpus journey hydrates the artifact and scores each arriving doc
    // with the same per-row fold — no state store.
    "stream_corpus_classify" -> { (s, d) =>
      import graft.operators.Classifier
      val art = "/tmp/graft_scratch/stream_classify/model.json"
      val docs = documents(s, d)
      // batch-side fit on the bounded sample (fitSampled: the feature
      // pass is capped too — no full-corpus pass hides in the train step)
      Classifier.saveModel(art, Classifier.fitSampled(docs, "doc_id",
        "text", when(Text.langId(col("text")) === "en", 1.0).otherwise(0.0),
        QueriesCuration.ClsBuckets, QueriesCuration.ClsIters,
        QueriesCuration.ClsEta))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: classify, target_lang: en, buckets: ${QueriesCuration.ClsBuckets}, iters: ${QueriesCuration.ClsIters}, eta: ${QueriesCuration.ClsEta.toInt}, min_prob: 0.5, artifact: $art }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_classify_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("quality_prob"))
    },

    // The COMPOSED curation stream: quality gate + Bloom decontamination
    // (bitmap persisted as a train-if-missing artifact — built once here,
    // hydrated by the stream) + trained-classifier gate, all at ingest in
    // one job — three per-row stages composed with zero state, the
    // multi-stage crawl gate a production pipeline deploys.
    "stream_corpus_curate" -> { (s, d) =>
      import graft.operators.Classifier
      // marker-gated benchmark fixture (see config_corpus_decontam)
      val benchPath = Q.ensureFixture(d, "documents",
        "/tmp/graft_scratch/bench_curate/docs.parquet", "mod17") {
        documents(s, d).filter(pmod(col("doc_id"), lit(17)) === 0)
          .write.mode("overwrite")
          .parquet("/tmp/graft_scratch/bench_curate/docs.parquet")
      }
      val bloomArt = "/tmp/graft_scratch/stream_curate/bloom.json"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(bloomArt))
      val clsArt = "/tmp/graft_scratch/stream_curate/cls.json"
      val docs = documents(s, d)
      Classifier.saveModel(clsArt, Classifier.fitSampled(docs, "doc_id",
        "text", when(Text.langId(col("text")) === "en", 1.0).otherwise(0.0),
        QueriesCuration.ClsBuckets, QueriesCuration.ClsIters,
        QueriesCuration.ClsEta))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |  - id: bench
           |    loader: { transport: fs, path: $benchPath, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: decontaminate, benchmark: bench, ngram: 3, method: bloom, artifact: $bloomArt }
           |    - { step: classify, target_lang: en, buckets: ${QueriesCuration.ClsBuckets}, iters: ${QueriesCuration.ClsIters}, eta: ${QueriesCuration.ClsEta.toInt}, min_prob: 0.5, artifact: $clsArt }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_curate_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("source"), col("quality_prob"))
    },

    // The domain-mixture gate AT INGEST: rates fit batch-side on the full
    // corpus (one bounded row per domain, persisted as a JSON artifact),
    // then the streaming journey gates each arriving doc with a per-row
    // map lookup + sha256-ratio filter — zero state; fitting on a stream
    // is rejected by name.
    "stream_corpus_mix" -> { (s, d) =>
      import graft.operators.Importance
      val art = "/tmp/graft_scratch/stream_mix/rates.json"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(art))
      Importance.saveRates(art, Importance.domainMixRates(documents(s, d),
        "source", Text.tokenCountWs(col("text")))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: mix, by: source, seed: $MixSeed, artifact: $art }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_mix_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("source"))
    },

    // The importance gate AT INGEST: the model trains batch-side on the
    // full corpus (the deploy shape — train once, every crawl streams
    // through it), then the streaming corpus journey applies quality gate +
    // hydrated-model scoring as pure per-row folds — no state store.
    "stream_corpus_select" -> { (s, d) =>
      import graft.operators.Importance
      val art = "/tmp/graft_scratch/stream_dsir/model.json"
      Importance.saveModel(art, Importance.dsirModel(
        documents(s, d), "text",
        Text.langId(col("text")) === "en", DsirBuckets))
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: select, target_lang: en, buckets: $DsirBuckets, min_score: 0.0, artifact: $art }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_select_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("dsir_score"))
    },

    // The FIM example builder AT INGEST inside the declarative journey:
    // quality gate + terminal `fim:` step, both pure per-row (the PSM
    // reorder is sha-gated per doc — no state store, no join), so arriving
    // docs land as pretraining examples. Shares Curation.fimTransform with
    // the batch journey (config_corpus_fim) and the standalone heads —
    // row-equal to the batch prefix by construction.
    "stream_corpus_fim" -> { (s, d) =>
      val project = graft.pipeline.Config.parseProject(
        s"""sources:
           |  - id: docs
           |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
           |corpus:
           |  source: docs
           |  steps:
           |    - { step: filter, max_repetition: 0.8 }
           |    - { step: fim, rate: ${QueriesMining.FimRate} }
           |""".stripMargin)
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_fim_j_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("fim_applied"), col("n_tokens"),
          col("pre_len"), col("mid_len"), col("suf_len"), col("output"))
    }
  )

  private val StreamRun = new java.util.concurrent.atomic.AtomicInteger(0)

  val oracleSql: Map[String, String] = Map(
    "substring_dedup" -> substringDedupSql,
    "substring_spans" -> substringSpansSql,
    "dsir_select" -> dsirSelectSql,
    "domain_mix" -> domainMixSql,
    "bigram_logprob" -> bigramLogprobSql,
    "perplexity_bucket" -> perplexityBucketSql,
    "shard_manifest" -> shardManifestSql,
    "shard_balance" ->
      s"""WITH manifest AS ($shardManifestSql)
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_shards,
                 MIN(n_tokens) AS min_tokens,
                 MAX(n_tokens) AS max_tokens,
                 ROUND(CAST(SUM(n_tokens) AS DOUBLE) / count(*), 6)
                   AS mean_tokens,
                 ROUND(CAST(MIN(n_tokens) AS DOUBLE)
                       / CAST(MAX(n_tokens) AS DOUBLE), 6) AS balance
          FROM manifest GROUP BY source""",
    "ann_pq" -> annPqSql,
    "config_corpus_serve" -> configCorpusServeSql,
    "config_corpus_classify" -> configCorpusClassifySql,
    "config_corpus_decontam" -> corpusDecontamSql,
    "config_corpus_full" -> corpusFullSql,
    "stream_corpus_decontam" -> corpusDecontamSql,
    "stream_corpus_curate" -> streamCorpusCurateSql,
    "stream_corpus_mix" -> streamCorpusMixSql,
    "stream_corpus_select" -> streamCorpusSelectSql,
    "stream_corpus_fim" ->
      s"""WITH fim_kept AS (
            SELECT d.doc_id, d.text FROM documents d
            WHERE ${repSql("d")} <= 0.8),
          ${QueriesMining.fimTailSql("fim_kept", QueriesMining.FimRate)}""",
    "stream_corpus_classify" -> streamCorpusClassifySql,
    "multimodal_phash" -> multimodalPhashSql,
    "multimodal_audio_dedup" -> multimodalAudioDedupSql,
    "multimodal_video_dedup" -> multimodalVideoDedupSql
  )
}
