#!/usr/bin/env bash
# Round-12 ask #1: clean solo best-of-2 re-measures of the sf100 heads the
# r11 sweep measured under an end-of-sweep load ramp (2.8 -> 29), plus the
# heads whose plans were reworked this round. One sbt JVM per group per
# pass, quiet machine, results folded into bench_sf100_full_surface.json
# by tools/fold_sf100.py (min over the two passes).
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_STREAM_SINK=parquet

GROUPS_LIST=(
  "tpch:q1_pricing,q3_topk,cooccurrence_ppmi,ann_recall,decontam_semantic"
  "sinks:sink_roundtrip,sink_partitioned,sink_compacted,sink_compact_incremental"
  "ordered:ensure_ticks,rolling_median,substring_spans"
  "classifier:quality_classifier,config_corpus_classify,stream_corpus_classify,classifier_calibration,stream_corpus_curate"
  "warcgz:src_warc_gz"
)

for pass in 1 2; do
  for g in "${GROUPS_LIST[@]}"; do
    name="${g%%:*}"; heads="${g#*:}"
    out="/tmp/sf100_r12_${name}_p${pass}.json"
    echo "[remeasure] pass $pass group $name" >&2
    SPARK_GRAFT_ONLY="$heads" \
    SPARK_GRAFT_SF_DIR=data/sf100 \
    SPARK_GRAFT_BENCH_OUT="$out" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true
  done
done
