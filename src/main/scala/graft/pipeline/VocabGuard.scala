package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stats-gated broadcast hint for VOCABULARY-DERIVED frames (r13 verdict
  * ask #1 — the last un-pressure-tested 100 TB assumption).
  *
  * Several heads join the corpus against a frame whose row count is "the
  * distinct tokens of the corpus" (BigramLm's unigram prefix table,
  * tfidf_topterms' document-frequency table, unigram_logprob's and
  * heldout_nll's frequency tables). "Vocabulary-bounded" is true of
  * natural language but NOT of a noisy web crawl: unique typos, ids, and
  * numbers grow with the corpus (Heaps' law never plateaus on crawl
  * noise), so at 100 TB the distinct-token frame can exceed any broadcast
  * threshold — a FORCED `broadcast()` hint would then OOM the driver or
  * blow the 8 GB broadcast hard cap.
  *
  * The guard keys on the cheapest honest signal available at plan-build
  * time with ZERO extra jobs: the Catalyst size estimate of the CORPUS
  * scan feeding the vocabulary aggregate (`optimizedPlan.stats
  * .sizeInBytes` — parquet footer totals, no data read). Under the
  * ceiling, the hint is forced exactly as before (the estimate-blind
  * planner would otherwise plan a corpus-shuffling SortMergeJoin because
  * aggregate output stats inherit their input's estimate). Over it, the
  * hint is DROPPED and the plan falls back to a shuffled join — the vocab
  * side's exchange is vocabulary-bounded, the corpus side's exchange is
  * the price of safety, and AQE remains free to convert back to broadcast
  * at runtime using the MEASURED post-aggregate size (its thresholds, its
  * memory guardrails). Results are identical either way; only the plan
  * changes — so every gated hash is unchanged by construction.
  *
  * The ceiling (default 16 GiB of corpus scan) is far above every test
  * scale (sf100's documents table is ~31 MB of parquet) and far below a
  * 100 TB crawl; `graft.vocab_broadcast.max_corpus_bytes` overrides it per
  * session (specs plant a pathological posture by setting it to 1).
  */
object VocabGuard {

  /** Corpus-scan ceiling under which a derived vocabulary frame may carry
    * a forced broadcast hint. ~16 GiB of parquet is ≳3B tokens; even at a
    * pessimistic crawl-noise distinct ratio the vocab frame stays well
    * inside the 8 GB broadcast cap, with margin for the stats estimate's
    * slack.
    */
  val DefaultMaxCorpusBytes: Long = 16L << 30

  val ConfKey = "graft.vocab_broadcast.max_corpus_bytes"

  /** `broadcast(vocab)` when the corpus scan estimate is under the
    * ceiling; `vocab` untouched (shuffled-join fallback, AQE free to
    * re-decide at runtime) when it is not. `corpus` must be the frame the
    * vocabulary was aggregated FROM — its scan stats are the proxy for
    * vocabulary growth.
    */
  /** The same corpus-scan signal [[hint]] keys on, exposed for call sites
    * that pick a PLAN rather than a hint (cooccurrence_ppmi's
    * dictionary-encoded pair keys driver-collect the vocabulary). Unlike
    * [[hint]], an UNKNOWN estimate (RDD-backed corpus reporting
    * defaultSizeInBytes) counts as NOT bounded: a driver collect has no
    * AQE backstop, so the caller must take its collect-free fallback.
    */
  def corpusBounded(corpus: DataFrame): Boolean = {
    val max = BigInt(corpus.sparkSession.conf.getOption(ConfKey)
      .map(_.toLong).getOrElse(DefaultMaxCorpusBytes))
    val est = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    est < BigInt(corpus.sparkSession.sessionState.conf.defaultSizeInBytes) &&
      est <= max
  }

  def hint(vocab: DataFrame, corpus: DataFrame, site: String): DataFrame = {
    val max = BigInt(vocab.sparkSession.conf.getOption(ConfKey)
      .map(_.toLong).getOrElse(DefaultMaxCorpusBytes))
    val est = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    // A corpus with NO honest estimate (a frame built straight over an
    // RDD — note localCheckpoint is NOT such a case on Spark 4, its
    // LogicalRDD preserves origin stats) reports Catalyst's substitute
    // spark.sql.defaultSizeInBytes (Long.MaxValue by default). That is
    // "unknown", not "huge": dropping the hint there would silently
    // un-broadcast RDD-backed pipelines at ANY scale (r14 advice).
    // Keep the hint on unknown — the gated sites are vocabulary-derived
    // by construction, and AQE's own 8 GB broadcast cap still backstops
    // a pathological vocab at runtime.
    val unknown =
      est >= BigInt(vocab.sparkSession.sessionState.conf.defaultSizeInBytes)
    if (unknown) {
      System.err.println(
        s"[graft] $site: corpus scan estimate unavailable (RDD-backed " +
          "plan reports defaultSizeInBytes) — keeping the vocab broadcast " +
          "hint; AQE re-decides on measured size")
      broadcast(vocab)
    } else if (est <= max) broadcast(vocab)
    else {
      System.err.println(
        s"[graft] $site: corpus scan estimate $est B exceeds vocab-broadcast " +
          s"ceiling $max B — dropping the broadcast hint (shuffled-join " +
          "fallback; AQE may still broadcast on measured size)")
      vocab
    }
  }
}
