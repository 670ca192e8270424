#!/bin/bash
# Segmented train-step matrix: one fresh process per trainer family so a
# failed compile's leaked HBM allocations (see train_step_time.py bench())
# can't starve later families. Merges the per-family JSONs at the end.
#
#   bash benchmarks/run_matrix.sh BENCH_train_r03.json [SIZE] [BATCH]
set -u
OUT=${1:-BENCH_train_r03.json}
SIZE=${2:-384}
BATCH=${3:-8}
TMP=$(mktemp -d /tmp/benchmatrix.XXXX)
for fam in cycle sup unsup teaug mag single gan ldm phys scale; do
    echo "=== family: $fam ==="
    python -u benchmarks/train_step_time.py --size "$SIZE" --batch "$BATCH" \
        --iters 20 --trainers "$fam" --json "$TMP/$fam.json" || true
done
python - "$OUT" "$TMP" <<'EOF'
import json, sys, pathlib
out, tmp = sys.argv[1], pathlib.Path(sys.argv[2])
merged = None
order = ["cycle", "sup", "unsup", "teaug", "mag", "single", "gan", "ldm",
         "phys", "scale"]
for fam in order:
    p = tmp / f"{fam}.json"
    if not p.exists():
        print(f"missing family result: {fam}", file=sys.stderr)
        continue
    d = json.loads(p.read_text())
    if merged is None:
        merged = dict(d, results=[])
    merged["results"].extend(d["results"])
if merged is None:
    # nothing ran (e.g. no TPU): do NOT clobber a previous good artifact
    sys.exit(f"no family results under {tmp} — {out} left untouched")
with open(out, "w") as f:
    json.dump(merged, f, indent=2)
    f.write("\n")
print(f"wrote {out} ({len(merged['results'])} rows)")
EOF
