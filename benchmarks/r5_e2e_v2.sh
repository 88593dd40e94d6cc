#!/bin/bash
# Round-5 end-to-end v2: the v1 run (r5_e2e.sh) with three fixes the
# v1 evidence motivated:
#   * BROADBAND synthetic corpus (mixture/synthetic.py): v1's
#     narrowband harmonic stacks made ESTOI degenerate (10 of 15
#     third-octave bands without target energy); v2 speech carries
#     formant-shaped harmonics + 1.5-7 kHz fricative noise, so all
#     intelligibility metrics are meaningful.
#   * One synth/train compile signature (data.py batch/BRIR/sample
#     caps): v1 paid 43 synthesize_batch compiles / 740 s.
#   * Device-side colored noise + in-graph BRIR padding: v1 spent
#     152 ms/batch of host FFT noise synthesis and shipped ~13.5 MB
#     h2d per batch; v2 ships ~3 MB and the host prep is ~27 ms.
# Same model family + hyperparameters as v1 (convtasnet, 40 epochs,
# batch 16, 256 scenes/epoch) so in-loop steps/s is comparable.
#
# Usage: bash benchmarks/r5_e2e_v2.sh [stage...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=benchmarks/r5_e2e_v2.log
WORK=data/r5_e2e_v2

say() { echo "[r5_e2e_v2 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() { say "RUN: $*"; "$@" >> "$LOG" 2>&1; local rc=$?; say "rc=$rc"; return $rc; }

mkdir -p "$WORK"
STAGES="${*:-all}"
say "=== r5 e2e v2 start (stages: $STAGES) ==="

want() { [ "$STAGES" = all ] && return 0; case " $STAGES " in *" $1 "*) return 0;; *) return 1;; esac; }

# ---- stage 0: TPU probe
if want probe; then
  say "probing TPU backend"
  timeout 150 python -c 'import jax,sys; d=jax.devices(); sys.exit(0 if d and d[0].platform != "cpu" else 1)'
  if [ $? -ne 0 ]; then say "TPU backend unreachable — aborting"; exit 2; fi
  say "TPU backend alive"
fi

# ---- stage 1: broadband synthetic corpus (v2 lives in its own root)
if want corpus; then
  if [ ! -d data/external/synth2 ]; then
    run python -c "from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus as m; m('data/external/synth2', n_speakers=10, files_per_speaker=10, duration_range=(1.0, 2.0), seed=0)" || exit 3
    # point the SYNTH alias at the broadband corpus for this repo
    python - <<'EOF'
import yaml
p = 'config/paths.yaml'
d = yaml.safe_load(open(p))
d['SYNTH'] = 'data/external/synth2/'
yaml.dump(d, open(p, 'w'))
EOF
  else
    say "corpus exists, skipping"
  fi
fi

COMMON_DSET_ARGS=(--speakers 'synth_.*' --noises colored_pink
  --rooms 'synthetic_.*' --room_files all
  --decay True --decay_rt60_dist_args 0.1,0.4 --decay_drr_dist_args 5,20
  --noise_num 1,2 --target_snr_dist_args=-5,10 --seed 100)

# ---- stage 2: dataset config dirs + static val/test creation
if want datasets; then
  TRAIN_DSET=$(python scripts/init_dataset.py train "${COMMON_DSET_ARGS[@]}" --duration 64 2>>"$LOG" | tail -1)
  VAL_DSET=$(python scripts/init_dataset.py val "${COMMON_DSET_ARGS[@]}" --duration 64 2>>"$LOG" | tail -1)
  TEST_DSET=$(python scripts/init_dataset.py test "${COMMON_DSET_ARGS[@]}" --duration 96 2>>"$LOG" | tail -1)
  say "train=$TRAIN_DSET val=$VAL_DSET test=$TEST_DSET"
  echo "$TRAIN_DSET" > "$WORK/train_dset"; echo "$VAL_DSET" > "$WORK/val_dset"; echo "$TEST_DSET" > "$WORK/test_dset"
  [ -f "$VAL_DSET/mixture_info.json" ] || run python scripts/create_dataset.py "$VAL_DSET" || exit 4
  [ -f "$TEST_DSET/mixture_info.json" ] || run python scripts/create_dataset.py "$TEST_DSET" || exit 4
fi
TRAIN_DSET=$(cat "$WORK/train_dset"); VAL_DSET=$(cat "$WORK/val_dset"); TEST_DSET=$(cat "$WORK/test_dset")

# ---- stage 3: model config dir
if want model; then
  MODEL_DIR=$(python scripts/init_model.py \
    --train_path "$TRAIN_DSET" --val_path "$VAL_DSET" \
    --dynamic_mixing True --dynamic_mixing_device True \
    --dynamic_mixtures_per_epoch 256 \
    --epochs 40 --val_period 5 \
    --batch_size 16 --dynamic_batch_size False \
    --pad_quantum 2.0 --workers 0 --val_metrics snr \
    convtasnet 2>>"$LOG" | tail -1)
  say "model dir: $MODEL_DIR"
  echo "$MODEL_DIR" > "$WORK/model_dir"
fi
MODEL_DIR=$(cat "$WORK/model_dir" 2>/dev/null || true)

# ---- stage 4: train on the TPU (production loop)
if want train; then
  say "training $MODEL_DIR on TPU"
  run timeout 5400 env JAX_LOG_COMPILES=1 \
    python scripts/train_model.py "$MODEL_DIR" || exit 5
  say "train log tail:"
  tail -20 "$MODEL_DIR/log_train.log" | tee -a "$LOG"
fi

# ---- stage 5: score on the held-out test set (host metrics)
if want test; then
  run timeout 1800 python scripts/test_model.py -i "$MODEL_DIR" \
    -t "$TEST_DSET" --metrics pesq stoi estoi snr sisnr \
    --pad_quantum 2.0 --batch_size 64 || exit 6
  run python benchmarks/r5_e2e_digest.py "$MODEL_DIR" "$TEST_DSET" \
    benchmarks/r5_e2e_v2_digest.json
fi

say "=== r5 e2e v2 done ==="
