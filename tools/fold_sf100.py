#!/usr/bin/env python3
"""Fold clean re-measure passes into the standing sf100 artifact.

Usage: tools/fold_sf100.py <artifact.json> <pass.json>... [--note TEXT]

Each pass file is a graft.Bench JSON line. For every query present in a
pass, the artifact's row is REPLACED by the minimum across the passes
(clean solo measurement beats a load-ramped sweep row) — replaced
UNCONDITIONALLY, never min-folded with the old row: a stale row measured
at an older, faster code shape must not mask a regression introduced by
a plan rework. Per-row provenance lands in artifact["folds"] so a later
reader can see which rows came from which fold. A re-measured head that
previously failed is dropped from artifact["failed"]. The artifact's
total is recomputed as the sum of its rows, and the note records the
fold.
"""
import json, sys

def main():
    args = sys.argv[1:]
    note = None
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        args = args[:i] + args[i + 2:]
    artifact_path, passes = args[0], args[1:]
    with open(artifact_path) as f:
        artifact = json.load(f)
    best = {}
    for p in passes:
        with open(p) as f:
            d = json.load(f)
        for k, v in d["queries"].items():
            if v is None or v < 0:
                continue
            best[k] = min(best.get(k, v), v)
    replaced = {}
    for k, v in sorted(best.items()):
        old = artifact["queries"].get(k)
        # REPLACE with the cross-pass min: the old row may predate the
        # current code shape, so it must not cap the new measurement
        artifact["queries"][k] = v
        if old is None or v != old:
            replaced[k] = (old, v)
    artifact["failed"] = [
        f for f in artifact.get("failed", []) if f not in best]
    artifact["value"] = sum(v for v in artifact["queries"].values() if v >= 0)
    folds = artifact.setdefault("folds", [])
    folds.append({"note": note, "passes": passes,
                  "replaced": sorted(best.keys())})
    if note:
        artifact["note"] = note
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1)
    for k, (old, new) in replaced.items():
        os = f"{old:.1f}" if old is not None else "NEW"
        print(f"fold {k:32s} {os:>8} -> {new:.1f}")
    print(f"total -> {artifact['value']:.1f} over {len(artifact['queries'])} heads")

if __name__ == "__main__":
    main()
