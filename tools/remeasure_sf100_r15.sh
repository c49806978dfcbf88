#!/usr/bin/env bash
# Round-15 sf100 measures:
#  1. cooccurrence_ppmi same-day A/B — packed dictionary keys (HEAD)
#     vs the string-key plan (forced via the SPARK_GRAFT_CONF ceiling
#     override), two passes each (verdict ask #1).
#  2. The four tokenizer heads COLD (fresh cache, SPARK_GRAFT_RUNS=1) to
#     price the one-time fits — the bench_sf100_lm_fit_cold.json
#     discipline — then WARM (hydrated artifacts, best-of-2, two passes)
#     for the board rows (ask #4).
#  3. approx_distinct solo from quiet — name the superlinear cause or
#     exonerate it as weather (ask #3).
#  4. sink_compact_incremental solo on a quiet machine for the honest
#     fold (ask #5), side JSON captured per pass.
#
# Discipline (r12/r13 findings): every pass file is removed before its
# run so a crashed pass can never leave a stale file for the fold; sbt's
# exit status is checked separately from the grep. Bench self-settles
# (reaps stray graft JVMs by whole-argv match, syncs, waits for load<3)
# and now solo-confirms any >2x-floor row inside the artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_STREAM_SINK=parquet

TOK_HEADS="bpe_artifact,wordpiece_artifact,stream_corpus_tokenize,stream_corpus_tokenize_wp"
TOK_CACHE=/tmp/graft_scratch/tok_cache

run_group() {
  local heads="$1" out="$2" extra_conf="${3:-}" runs="${4:-}"
  rm -f "$out"
  local log="${out%.json}.log"
  if ! SPARK_GRAFT_ONLY="$heads" \
       SPARK_GRAFT_SF_DIR=data/sf100 \
       SPARK_GRAFT_BENCH_OUT="$out" \
       SPARK_GRAFT_CONF="$extra_conf" \
       SPARK_GRAFT_RUNS="${runs:-2}" \
       sbt -batch "runMain graft.Bench" > "$log" 2>&1; then
    echo "[remeasure] FAILED (sbt exit) — see $log" >&2
    exit 1
  fi
  grep '"metric"' "$log" >&2 || true
  if [ ! -s "$out" ]; then
    echo "[remeasure] FAILED — $out missing/empty after run" >&2
    exit 1
  fi
}

# --- 2a. tokenizer fits COLD (single cold run prices fit + apply) ------
rm -rf "$TOK_CACHE"
run_group "$TOK_HEADS" /tmp/sf100_r15_tok_cold.json "" 1

# --- 1. ppmi A/B + 2b. tokenizer WARM + 3/4 solos, two passes ----------
for pass in 1 2; do
  echo "[remeasure] pass $pass ppmi packed" >&2
  run_group "cooccurrence_ppmi" "/tmp/sf100_r15_ppmi_packed_p${pass}.json"
  echo "[remeasure] pass $pass ppmi string (forced fallback)" >&2
  run_group "cooccurrence_ppmi" "/tmp/sf100_r15_ppmi_string_p${pass}.json" \
    "graft.vocab_broadcast.max_corpus_bytes=1"
  echo "[remeasure] pass $pass tokenizers warm" >&2
  run_group "$TOK_HEADS" "/tmp/sf100_r15_tok_warm_p${pass}.json"
  echo "[remeasure] pass $pass approx_distinct solo" >&2
  run_group "approx_distinct" "/tmp/sf100_r15_adist_p${pass}.json"
  echo "[remeasure] pass $pass sink_compact_incremental solo" >&2
  run_group "sink_compact_incremental" "/tmp/sf100_r15_sink_p${pass}.json"
  cp -f bench_side_compact_incremental.json \
    "/tmp/sf100_side_r15_sink_p${pass}.json" 2>/dev/null || true
done
echo "[remeasure] all passes complete" >&2
