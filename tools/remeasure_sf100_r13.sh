#!/usr/bin/env bash
# Round-13 sf100 re-measures: the heads whose plans this round reworked
# (crawl extraction -> native HtmlText; bigram LM -> train-if-missing
# artifact; zipf_fit -> level-table ranks; CMS -> one-digest positions;
# stream_sessionize -> batched span sweep) plus the ask-#4/#7 cost-board
# rows. Two clean solo passes per group, folded into
# bench_sf100_full_surface.json by tools/fold_sf100.py.
#
# Advice-hardened discipline (r12 findings): every pass file is removed
# before its run so a crashed pass can never leave a stale file for the
# fold; sbt's exit status is checked separately from the grep; the fold
# step runs HERE, after every expected pass file is checked present.
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_STREAM_SINK=parquet

GROUPS_LIST=(
  "crawl:html_extract,config_corpus_crawl,stream_corpus_extract"
  "lm:bigram_logprob,perplexity_bucket"
  "mining:zipf_fit,heavy_hitters,stream_heavy_hitters"
  "sessions:sessionize,stream_sessionize"
  "board:sink_bucketed,config_dataset,config_sequence"
)

run_group() {
  local heads="$1" out="$2"
  rm -f "$out"
  local log="${out%.json}.log"
  if ! SPARK_GRAFT_ONLY="$heads" \
       SPARK_GRAFT_SF_DIR=data/sf100 \
       SPARK_GRAFT_BENCH_OUT="$out" \
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

# one-time artifact-fit price: a single cold run of the bigram LM head
# (best-of-2 would amortize the fit away); recorded beside the floors,
# never folded into the standing artifact
rm -rf /tmp/graft_scratch/bigram_lm
SPARK_GRAFT_RUNS=1 run_group "bigram_logprob" /tmp/sf100_r13_lm_fit_cold.json

for pass in 1 2; do
  for g in "${GROUPS_LIST[@]}"; do
    name="${g%%:*}"; heads="${g#*:}"
    echo "[remeasure] pass $pass group $name" >&2
    run_group "$heads" "/tmp/sf100_r13_${name}_p${pass}.json"
  done
done

for g in "${GROUPS_LIST[@]}"; do
  name="${g%%:*}"
  for pass in 1 2; do
    f="/tmp/sf100_r13_${name}_p${pass}.json"
    [ -s "$f" ] || { echo "fold refused: $f missing" >&2; exit 1; }
  done
done

# The fold itself (advice r13: the guard above protected a step the
# operator had to run by hand — now the validated files are exactly the
# files folded)
python3 tools/fold_sf100.py bench_sf100_full_surface.json \
  /tmp/sf100_r13_*_p*.json \
  --note "r13 remeasure: crawl/lm/mining/sessions/board groups, 2 clean solo passes each"
