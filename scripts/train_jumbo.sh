#!/bin/bash
# Jumbo-charset (~5,008-class) recognizer training runbook — the one
# remaining chip-blocked round-3 deliverable (weights/rec_scene_jumbo.npz;
# the det side needs NO retrain: weights/det_synthetic_text.npz scores
# 100% IoU-recall on jumbo scenes at the gate scale, measured on CPU).
#
# Run on a healthy chip (verify first: timeout 90 python -c
# "import jax; print(jax.devices())"). Total chip time ~15-30 min.
set -euo pipefail
cd "$(dirname "$0")/.."

# 1) pilot — 1k steps, warm start from the 218-class bundle's backbone
#    (CTC head is surgically re-sized to the jumbo charset automatically).
#    Decision gate: loss should fall well under ~30 and eval should show
#    exact matches appearing; step time ~40-80 ms after the first compile.
timeout 2400 python -u scripts/train_synthetic_rec.py \
  --scene-crops --alphabet jumbo --img-w 256 --aug-rotate 8 \
  --steps 1000 --batch 32 --eval-batches 4 \
  --init-weights weights/rec_scene_full.npz \
  --out /tmp/rec_jumbo_pilot.npz 2>&1 | tail -30

# 2) full run — fresh warm start (clean cosine schedule over the full
#    step count beats resuming the pilot's decayed LR). batch 48 ≈ 650k
#    samples ≈ 130 per class.
timeout 14400 python -u scripts/train_synthetic_rec.py \
  --scene-crops --alphabet jumbo --img-w 256 --aug-rotate 8 \
  --steps 14000 --batch 48 --eval-batches 6 \
  --init-weights weights/rec_scene_full.npz \
  --out weights/rec_scene_jumbo.npz 2>&1 | tail -40

# 3) gates (hermetic CPU suite; the 3 skips become real tests)
python -m pytest tests/test_e2e_trained_jumbo.py -q

# 4) bench with the jumbo accuracy fields + regression baseline refresh
python bench.py --check --update-good

# 5) then: update docs/PERF.md + COVERAGE.md + weights/README.md numbers,
#    ROADMAP ledger, and commit the bundle.
