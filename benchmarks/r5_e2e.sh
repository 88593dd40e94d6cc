#!/bin/bash
# Round-5 end-to-end production-path training on the real TPU.
#
# Exercises the FULL user workflow with zero external databases
# (synthetic corpus + synthetic rooms + colored noise):
#   1. synthetic speech corpus           (brever_tpu.mixture.synthetic)
#   2. scripts/init_dataset.py           train (dynamic) / val / test
#   3. scripts/create_dataset.py         static val + test tars (FLAC)
#   4. scripts/init_model.py             hashed convtasnet config dir
#   5. scripts/train_model.py            real trainer loop on the TPU
#      - on-device dynamic mixing, device val metrics, checkpoints
#   6. scripts/test_model.py             scores.hdf5 on held-out test
#
# Shape policy: every train batch is (16, 2, 2, 32000) — fixed batch
# size 16, 1-2 s clips, pad_quantum 2.0 s — so the tunneled TPU
# backend compiles the train step ONCE (no persistent compile cache is
# viable over the tunnel; see bench.py), and that one Mosaic compile
# is half the 4 s program's (the first attempt sat >49 min in the 4 s
# flash-TCN train-step compile on a 4x-weather day and timed out).
# Device val metric is snr only: the estoi/pesq device twins' 172-738 s
# first-call compiles move to the host-scored test stage instead.
#
# Usage: bash benchmarks/r5_e2e.sh [stage...]   (default: all stages)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=benchmarks/r5_e2e.log
WORK=data/r5_e2e

say() { echo "[r5_e2e $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() { say "RUN: $*"; "$@" >> "$LOG" 2>&1; local rc=$?; say "rc=$rc"; return $rc; }

mkdir -p "$WORK"
STAGES="${*:-all}"
say "=== r5 e2e start (stages: $STAGES) ==="

want() { [ "$STAGES" = all ] && return 0; case " $STAGES " in *" $1 "*) return 0;; *) return 1;; esac; }

# ---- stage 0: TPU probe (subprocess with deadline; tunnel can wedge)
if want probe; then
  say "probing TPU backend"
  timeout 150 python -c 'import jax,sys; d=jax.devices(); sys.exit(0 if d and d[0].platform != "cpu" else 1)'
  if [ $? -ne 0 ]; then say "TPU backend unreachable — aborting"; exit 2; fi
  say "TPU backend alive"
fi

# ---- stage 1: synthetic corpus
if want corpus; then
  if [ ! -d data/external/synth ]; then
    run python -c "from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus as m; m('data/external/synth', n_speakers=10, files_per_speaker=10, duration_range=(1.0, 2.0), seed=0)" || exit 3
  else
    say "corpus exists, skipping"
  fi
fi

# ---- stage 2: dataset config dirs + static val/test creation
COMMON_DSET_ARGS=(--speakers 'synth_.*' --noises colored_pink
  --rooms 'synthetic_.*' --room_files all
  --decay True --decay_rt60_dist_args 0.1,0.4 --decay_drr_dist_args 5,20
  --noise_num 1,2 --target_snr_dist_args=-5,10)

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

# ---- stage 5: score on the held-out test set
if want test; then
  # host metrics at test time: the device twins' first-call compiles
  # (172-738 s observed) are a bad trade on a bad-weather day; the
  # enhanced-audio d2h fetch for this test set is ~5 MB
  run timeout 1800 python scripts/test_model.py -i "$MODEL_DIR" \
    -t "$TEST_DSET" --metrics pesq estoi snr sisnr \
    --pad_quantum 2.0 --batch_size 64 || exit 6
  run python benchmarks/r5_e2e_digest.py "$MODEL_DIR" "$TEST_DSET"
fi

say "=== r5 e2e done ==="
