#!/bin/bash
# Round-3 honest re-tune after the block_until_ready fix
# (artifacts/measurement.md): every spec in its own process.
cd /root/repo
OUT=${1:-/tmp/honest_sweep.jsonl}
: > "$OUT"
SPECS=(
  # wildfire: rnd_mode and chunk re-pick + kernel + per-step
  wildfire:xla-ms:16:inloop
  wildfire:xla-ms:16:packed
  wildfire:xla-ms:8:inloop
  wildfire:xla-ms:32:inloop
  wildfire:xla-step
  # collect: prefix_mode re-verify + chunk
  collect:xla-ms:25:packed:matmul
  collect:xla-ms:25:packed:adds
  collect:xla-ms:50:packed:matmul
  collect:xla-ms:25:inloop:matmul
  collect:xla-step
  # ctf: chunk re-pick
  ctf:xla-ms:50:packed
  ctf:xla-ms:25:packed
  ctf:xla-ms:100:packed
  ctf:xla-step
  # maze: chunk re-pick
  maze:xla-ms:200:packed
  maze:xla-ms:100:packed
  maze:xla-ms:200:inloop
  maze:xla-step
)
for spec in "${SPECS[@]}"; do
  timeout 590 python scripts/sweep_paths.py --spec "$spec" \
    --batch 8192 --steps 200 2>/dev/null | grep "^{" >> "$OUT"
done
echo DONE >> "$OUT"
