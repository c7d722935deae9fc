#!/bin/bash
# Backend-equivalence evidence (VERDICT round-1 item 5): train the small
# synthetic scene end-to-end twice — tiled Pallas backend vs the jnp
# oracle backend — and compare validation PSNR trajectories. Runs on the
# TPU; ~10 min per run.
set -e
cd "$(dirname "$0")/.."

for backend in tiled reference; do
  exp="output/equiv_${backend}"
  rm -rf "$exp"
  echo "=== backend=$backend -> $exp"
  LOG_TPU_BACKEND=$backend python apps/train.py \
    --cfg config/synthetic/train.yml split train exp "$exp" \
    2>&1 | grep -aE "psnr|Run stage|split:" | tail -20
done

python - <<'EOF'
import glob, json

for backend in ("tiled", "reference"):
    series = []
    for f in sorted(glob.glob(f"output/equiv_{backend}/**/scalars.jsonl",
                              recursive=True)):
        for line in open(f):
            r = json.loads(line)
            if r.get("key") == "val/psnr":
                series.append((r["step"], round(r["val"], 3)))
    print(backend, series)
EOF
