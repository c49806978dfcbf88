package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import Q._

/** Unigram-LM tokenizer heads (SURVEY §2.7 tokenizer family, beside the BPE
  * trio): hard-EM training over a vocabulary-bounded candidate table and
  * the artifact round trip. The oracle replays the ENTIRE EM trajectory in
  * DuckDB — rounds unroll as CTE blocks (the bpe_merges discipline) and the
  * per-word Viterbi is a recursive CTE carrying the dp vector and best path
  * as lists, with the same integer-micro scores and the same
  * longest-piece tie-break (`list_max` over {score, len} structs).
  *
  * Non-recursive CTEs referenced from inside a recursive CTE are marked
  * MATERIALIZED: DuckDB otherwise INLINES them into the recursion and
  * re-evaluates the whole upstream chain once per iteration — measured 35 s
  * vs 0.6 s on the sf0.01 gate for this query.
  */
object QueriesUnigram {

  private val P = Unigram.MaxPieceLen
  private val C = Unigram.CandidateCap
  private val R = Unigram.EmRounds
  private val Unk = Unigram.UnkLpMicros

  /** Distinct-word vocabulary CTE over `documents` (optionally filtered). */
  private def wsrcCte(name: String, where: String): String =
    s"""$name AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
            FROM documents $where)
          WHERE word != '' GROUP BY word)"""

  /** Candidate table + fixed candidate set with initial counts c0. */
  private def candCtes(src: String): String =
    s"""cand AS (SELECT piece, CAST(SUM(n) AS BIGINT) AS freq FROM (
            SELECT n, unnest(flatten([[word[s : s + l - 1]
                                       for s in generate_series(1, len(word) - l + 1)]
                                      for l in generate_series(1, $P)])) AS piece
            FROM $src) GROUP BY piece),
        v0 AS MATERIALIZED (
          SELECT piece, freq FROM cand WHERE len(piece) = 1
          UNION ALL
          SELECT piece, freq FROM (
            SELECT piece, freq FROM cand WHERE len(piece) >= 2
            ORDER BY freq DESC, piece LIMIT $C)),
        c0 AS MATERIALIZED (SELECT piece, freq AS cnt FROM v0)"""

  /** M-step: counts `fromCnt` → add-one-smoothed micro log-prob map
    * `m$tag`. The double ratio and its round-6 ln are computed exactly as
    * the Spark side's Unigram.lnMicros.
    */
  private def probCtes(tag: String, fromCnt: String): String =
    s"""t$tag AS (SELECT CAST(SUM(cnt) + COUNT(*) AS DOUBLE) AS t FROM $fromCnt),
        lp$tag AS (SELECT piece,
            CAST(CAST(ROUND(ln(CAST(cnt + 1 AS DOUBLE) / t), 6)
                 AS DECIMAL(20,6)) * 1000000 AS BIGINT) AS lp
          FROM $fromCnt, t$tag),
        m$tag AS MATERIALIZED (SELECT map(list(piece), list(lp)) AS mp FROM lp$tag)"""

  /** Viterbi over every word of `src` under map `m$tag`: a recursive CTE
    * stepping one character per iteration, state = dp vector (integer
    * micros) + per-position best path, tie-break = longest piece among
    * score maximizers (lexicographic struct max). `seg$tag` is (word, n,
    * path).
    */
  private def viterbiCtes(tag: String, src: String): String =
    s"""vit$tag AS (
          SELECT word, n, 0 AS pos,
                 [CAST(0 AS BIGINT)] AS dps,
                 [CAST([] AS VARCHAR[])] AS paths
          FROM $src
          UNION ALL
          SELECT word, n, pos + 1,
                 list_append(dps, best.sc),
                 list_append(paths, list_append(paths[pos + 2 - best.l],
                                                word[pos + 2 - best.l : pos + 1]))
          FROM (
            SELECT word, n, pos, dps, paths,
                   list_max([{'sc': dps[pos + 2 - l] +
                                coalesce(mp[word[pos + 2 - l : pos + 1]][1],
                                         CASE WHEN l = 1 THEN CAST($Unk AS BIGINT) END),
                              'l': l}
                             for l in generate_series(1, least($P, pos + 1))
                             if (mp[word[pos + 2 - l : pos + 1]][1] IS NOT NULL OR l = 1)]) AS best
            FROM vit$tag, m$tag
            WHERE pos < len(word))
        ),
        seg$tag AS (SELECT word, n, paths[len(word) + 1] AS path
                    FROM vit$tag WHERE pos = len(word))"""

  /** One EM round: probs from c$(i-1), Viterbi counts, zero-filled c$i. */
  private def roundCtes(i: Int): String =
    s"""${probCtes(i.toString, s"c${i - 1}")},
        ${viterbiCtes(i.toString, "wsrc")},
        sc$i AS (SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt
                 FROM (SELECT n, unnest(path) AS piece FROM seg$i) GROUP BY piece),
        c$i AS MATERIALIZED (
          SELECT v.piece, coalesce(s.cnt, CAST(0 AS BIGINT)) AS cnt
          FROM v0 v LEFT JOIN sc$i s ON v.piece = s.piece)"""

  /** Training chain (wsrc → candidates → R unrolled EM rounds). */
  private def trainCtes(trainWhere: String): String =
    s"""${wsrcCte("wsrc", trainWhere)},
        ${candCtes("wsrc")},
        ${(1 to R).map(roundCtes).mkString(",\n")}"""

  private def unigramTokenizerSql: String = {
    val finals = (0 to R)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rnd, piece, cnt FROM c$i")
      .mkString("\nUNION ALL ")
    s"""WITH RECURSIVE ${trainCtes("")}
        $finals"""
  }

  /** Artifact round trip: train on the 4/5 split, then segment the FULL
    * corpus vocabulary under the FINAL model (UNK single-char fallback for
    * characters the split never saw) and aggregate per-document accounting
    * through the tf-compressed join — Unigram.encodeStatsWith's twin.
    */
  private def unigramArtifactSql: String =
    s"""WITH RECURSIVE ${trainCtes("WHERE doc_id % 5 != 0")},
        ${wsrcCte("wsrcf", "")},
        ${probCtes("f", s"c$R")},
        ${viterbiCtes("f", "wsrcf")},
        tokmap AS (SELECT word, CAST(len(path) AS BIGINT) AS wpieces FROM segf),
        dtf AS (
          SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
            FROM documents)
          WHERE word != '' GROUP BY doc_id, word),
        stats AS (
          SELECT doc_id,
                 CAST(SUM(tf) AS BIGINT) AS n_words,
                 CAST(SUM(tf * len(word)) AS BIGINT) AS n_chars,
                 CAST(SUM(tf * wpieces) AS BIGINT) AS n_pieces
          FROM dtf JOIN tokmap USING (word)
          GROUP BY doc_id)
        SELECT doc_id, n_words, n_chars, n_pieces FROM stats"""

  val queries: Map[String, QueryFn] = Map(
    // Unigram-LM tokenizer training (hard-EM): rnd 0 = candidate-table
    // frequencies (the fixed vocabulary: every character + the capped
    // multi-char pieces); rnd i = round i's Viterbi piece counts over the
    // full candidate set, zeros included. One corpus-sized word aggregate;
    // every round runs on the distinct-word frame with the fitted model
    // folded in as expression state.
    "unigram_tokenizer" -> { (s, d) =>
      Unigram.trajectoryFrame(documents(s, d), "text")
    },

    // The unigram artifact round trip (reference save/load_scaler
    // discipline): train on the 4/5 split, persist final counts as JSON,
    // hydrate, encode the FULL corpus — unseen characters segment through
    // the fixed UNK penalty, keeping the apply side total.
    "unigram_artifact" -> { (s, d) =>
      val docs = documents(s, d)
      val path = "/tmp/graft_scratch/unigram_artifact/tokenizer.json"
      Unigram.saveTokenizer(path, Unigram.train(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text").pieces)
      Unigram.encodeStatsWith(docs, "doc_id", "text",
        Unigram.loadTokenizer(path))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "unigram_tokenizer" -> unigramTokenizerSql,
    "unigram_artifact" -> unigramArtifactSql
  )
}
