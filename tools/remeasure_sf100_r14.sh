#!/usr/bin/env bash
# Round-14 sf100 re-measures: the heads whose plans this round reworked
# (zipf_fit -> chunked level folds; line_dedup + config_corpus_crawl ->
# dropped-position rebuild, bodies never shuffle) plus the NEW heads
# (wordpiece_artifact, config_corpus_fim, stream_corpus_fim) and the
# ask-#7 proof-vs-compaction split for sink_compact_incremental (its
# side JSON bench_side_compact_incremental.json records the compaction
# seconds; the row minus that is the gate-only proof read).
#
# Discipline (r12/r13 findings): every pass file is removed before its
# run so a crashed pass can never leave a stale file for the fold; sbt's
# exit status is checked separately from the grep; the fold step runs at
# the end, after every expected pass file is checked present. Bench
# itself now self-settles (reaps stray graft JVMs, syncs, waits for
# load < 3) before the first timed query.
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_STREAM_SINK=parquet

GROUPS_LIST=(
  "mining:zipf_fit"
  "crawl:line_dedup,config_corpus_crawl"
  "fim:fim_transform,stream_fim"
  "new:wordpiece_artifact"
  "fimj:config_corpus_fim,stream_corpus_fim"
  "sink:sink_compact_incremental"
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

for pass in 1 2; do
  for g in "${GROUPS_LIST[@]}"; do
    name="${g%%:*}"; heads="${g#*:}"
    echo "[remeasure] pass $pass group $name" >&2
    run_group "$heads" "/tmp/sf100_r14_${name}_p${pass}.json"
    if [ "$name" = sink ]; then
      cp -f bench_side_compact_incremental.json \
        "/tmp/sf100_side_r14_sink_p${pass}.json" 2>/dev/null || true
    fi
  done
done

for g in "${GROUPS_LIST[@]}"; do
  name="${g%%:*}"
  for pass in 1 2; do
    f="/tmp/sf100_r14_${name}_p${pass}.json"
    [ -s "$f" ] || { echo "fold refused: $f missing" >&2; exit 1; }
  done
done

python3 tools/fold_sf100.py bench_sf100_full_surface.json \
  /tmp/sf100_r14_*_p*.json \
  --note "r14 remeasure: zipf chunking, line_dedup dropped-position rebuild, new wordpiece/fim heads, compact-incremental proof split"
