#!/bin/bash
# Supervises the round-4 synthetic ladder (tools/synthetic_ladder.py)
# against TPU-relay outages and wedges (CLAUDE.md: relay drops strand the
# client in futex-wait with silent logs).  Loop:
#   0. if a ladder client from a previous supervisor is alive (PID file),
#      ADOPT it instead of launching a second TPU client
#   1. probe the relay with a tiny bounded program; sleep while it is down
#   2. relaunch the ladder resuming from the furthest stage with
#      artifacts (checkpoints ordered by EPOCH, not mtime — a resumed run
#      can leave mixed generations in one directory)
#   3. watch the log; if it goes silent >7 min, kill the client and loop
# Exits 0 when the ladder's final JSON (with "mota") has been printed.
#
# Stage-resume decision (see synthetic_ladder.py CLI; every --resumeN
# restores optimizer + epoch via TRAIN.RELOAD_OPTIMIZER for that stage):
#   final JSON in log            -> done
#   stage3 ckpt at --epochs3     -> --eval_ckpt  (training all done)
#   stage3 ckpts exist           -> --stage1_ckpt s1 --stage2_ckpt s2 --resume3 s3
#   stage2 ckpts exist           -> --stage1_ckpt s1 --resume2 s2
#   stage1 finished (stage2 dir) -> --stage1_ckpt s1
#   stage1 ckpts exist           -> --resume1 s1
#   nothing                      -> fresh run
set -u
cd /root/repo
# Every knob overridable via env (LADDER_OUT=output/ladder5
# LADDER_ARGS="--seqs 12 ..." bash tools/ladder_supervisor.sh); defaults
# reproduce the round-4 ladder4 run.
OUT=${LADDER_OUT:-output/ladder4}
LOG=${LADDER_LOG:-$OUT.log}
SLOG=${LADDER_SLOG:-output/ladder_supervisor.log}
EPOCHS3=${LADDER_EPOCHS3:-100}
read -r -a ARGS <<< "${LADDER_ARGS:---wide --seqs 8 --frames 48 \
--epochs1 1200 --epochs2 600 --epochs3 100 --lr 3e-4 --batch 4}"
ARGS=(--out "$OUT" "${ARGS[@]}")
read -r -a SETKV <<< "${LADDER_SETKV:-RCNN.CLS_FG_THRESH 0.35 \
RCNN.CLS_BG_THRESH 0.25 RCNN.REG_FG_THRESH 0.35 REID.FG_THRESH 0.35}"
SETKV=(--set "${SETKV[@]}")
# extra passthrough args placed BEFORE --set (e.g. --stage1_ckpt seed)
read -r -a XARGS <<< "${LADDER_XARGS:-}"

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$SLOG"; }

latest_stem() {  # highest-EPOCH checkpoint stem in dir $1, empty if none
  local best="" bestn=-1 f n
  for f in "$1"/checkpoint_epoch_*.ckpt; do
    [ -e "$f" ] || continue
    n=${f##*checkpoint_epoch_}; n=${n%.ckpt}
    if [ "$n" -gt "$bestn" ] 2>/dev/null; then bestn=$n; best="${f%.ckpt}"; fi
  done
  [ -n "$best" ] && echo "$best"
}

relay_ok() {
  # 300 s: a fresh relay boot compiles even a 128x128 matmul in ~290 s
  # (round 5, post-reboot); the old 90 s probe declared a COLD-but-alive
  # relay down forever
  timeout "${LADDER_PROBE_S:-300}" python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128)))))
" >/dev/null 2>&1
}

done_yet() { grep -q '"mota"' "$LOG" 2>/dev/null; }

monitor() {  # watch client $1; returns when it is gone (wedges killed)
  local pid=$1 age limit
  sleep 30
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
    # while epochs are ticking (last line is an epoch line) silence
    # means a wedge; anywhere else — stage start, stage transition,
    # final eval — the silence is a first compile via the remote
    # compile service (10-20 min fresh at wide configs; round 5 saw
    # the flat 7-min watchdog kill a HEALTHY fresh run mid-compile)
    if tail -n 1 "$LOG" 2>/dev/null | grep -q "epoch "
    then limit=${LADDER_WEDGE_EPOCH_S:-420}
    else limit=${LADDER_WEDGE_COMPILE_S:-1800}; fi
    if [ "$age" -gt "$limit" ]; then
      note "wedge: log silent ${age}s; killing $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      sleep 10
      return
    fi
  done
  note "ladder process $pid exited"
}

# adopt a still-running client from a previous supervisor instance
if [ -f /tmp/ladder.pid ] && kill -0 "$(cat /tmp/ladder.pid)" 2>/dev/null
then
  note "adopting live ladder client $(cat /tmp/ladder.pid)"
  monitor "$(cat /tmp/ladder.pid)"
fi

while true; do
  if done_yet; then note "ladder complete"; exit 0; fi
  if ! relay_ok; then note "relay down"; sleep 180; continue; fi

  s1=$(latest_stem "$OUT/stage1/ckpt" || true)
  s2=$(latest_stem "$OUT/stage2/ckpt" || true)
  s3=$(latest_stem "$OUT/stage3/ckpt" || true)
  # when a run is seeded past stage 1 (LADDER_XARGS="--stage1_ckpt ..."),
  # s1 stays empty — the seed flags come from XARGS instead
  EXTRA=()
  if [ -f "$OUT/stage3/ckpt/checkpoint_epoch_${EPOCHS3}.ckpt" ]; then
    EXTRA=(--eval_ckpt "$OUT/stage3/ckpt/checkpoint_epoch_${EPOCHS3}")
  elif [ -n "${s3:-}" ]; then
    # s2 guarded like s1: a run seeded past stage 2 via LADDER_XARGS has
    # no $OUT/stage2 checkpoints; an empty --stage2_ckpt would silently
    # retrain stage 2 from scratch while --resume3 resumes the old gen
    EXTRA=(${s1:+--stage1_ckpt "$s1"} ${s2:+--stage2_ckpt "$s2"} --resume3 "$s3")
  elif [ -n "${s2:-}" ]; then
    EXTRA=(${s1:+--stage1_ckpt "$s1"} --resume2 "$s2")
  elif [ -d "$OUT/stage2" ] && [ -n "${s1:-}" ]; then
    EXTRA=(--stage1_ckpt "$s1")
  elif [ -n "${s1:-}" ]; then
    EXTRA=(--resume1 "$s1")
  fi
  note "launching: ${XARGS[*]:-} ${EXTRA[*]:-fresh}"
  # NOTE --set must stay LAST (argparse.REMAINDER swallows later flags)
  python tools/synthetic_ladder.py "${ARGS[@]}" ${XARGS[@]:+"${XARGS[@]}"} \
      "${EXTRA[@]}" "${SETKV[@]}" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/ladder.pid
  monitor "$PID"
  sleep 20
done
