package graft.pipeline

import java.nio.file.{Path, Paths}

/** Train-if-missing tokenizer artifacts (r14 verdict ask #4 — the
  * BigramLm.scoresArtifact discipline applied to the tokenizer families).
  *
  * The four tokenizer heads (bpe_artifact, wordpiece_artifact,
  * stream_corpus_tokenize, stream_corpus_tokenize_wp) each re-trained
  * their merge table in-head per run — honest, but the fit is a pure
  * function of (corpus bytes, family, rounds, training split), so at
  * bench scale it amortizes exactly like the bigram LM fit: the first run
  * trains and persists the tokenizer JSON, every later run hydrates it,
  * and the one-time cold fits are priced separately on the sf100 board.
  *
  * Validity is `stored state == freshly computed state` where the state
  * embeds the RECURSIVE corpus file walk (ArtifactCache.pathState: every
  * leaf file's relpath:size:mtime_ns), the family, the round count, and
  * the training-split tag — a regenerated corpus, a different family, or
  * a changed split can never hydrate a stale table. The manifest stores
  * the FULL state string (not a hash), so the key can never degenerate
  * into a bare existence check and a maintainer can read what the
  * artifact was keyed on straight off disk. A corrupt manifest counts as
  * stale and refits (the BigramLm r14-advice contract).
  */
object TokenizerCache {

  /** Bump when the artifact layout or fingerprint recipe changes. */
  private val FormatVersion = 1

  /** Canonical fingerprint input for one trained tokenizer. */
  def state(family: String, rounds: Int, trainTag: String,
            tablePath: String): String =
    s"tok_v$FormatVersion|$family|rounds=$rounds|train=$trainTag|" +
      s"$tablePath|" + ArtifactCache.pathState(Paths.get(tablePath))

  /** The artifact path for `state`, training via `trainAndSave` only when
    * no valid cached copy exists — one thin delegation to the shared
    * [[ArtifactCache.ensure]] discipline (full-state manifest, corrupt
    * manifest counts as stale, manifest written after the train).
    */
  def ensure(cacheRoot: String, state: String)
            (trainAndSave: Path => Unit): Path =
    ArtifactCache.ensure(cacheRoot, state, "tokenizer.json")(trainAndSave)
}
