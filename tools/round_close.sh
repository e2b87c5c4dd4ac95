#!/bin/bash
# Round-close hygiene (flagged by the r8/r9/r10 verdicts): the driver
# writes BENCH_r{N}.json / CORRECTNESS_r{N}.json / BENCH_FULL_latest
# .json / LEAKCHECK.json AFTER the session's last commit, so three
# rounds in a row were judged with a dirty git status. Run this as the
# session's last action and after any bench/soak artifact write: it
# stages every known artifact pattern and commits iff something
# changed. Safe to run any number of times.
set -eu
cd /root/repo
shopt -s nullglob
files=(BENCH_*.json BENCH_*.json.perq BENCH_NOTES_*.md CORRECTNESS_*.json \
  LEAKCHECK.json COPYCHECK.json RECALL_*.json SOAK_*.json SOAK_*.md \
  STREAM_SOAK_*.json ETL_SOAK_*.json PROGRESS.jsonl PLANS.md)
for f in "${files[@]}"; do
  # driver-owned artifacts may be gitignored (COPYCHECK, PROGRESS) —
  # stage only what the repo actually tracks or can track
  git check-ignore -q "$f" || git add -- "$f"
done
if ! git diff --cached --quiet; then
  git commit -m "Round artifacts: bench/correctness/soak snapshots"
  echo "round_close: committed $(git diff-tree --no-commit-id --name-only -r HEAD | wc -l) artifact files"
else
  echo "round_close: nothing to commit"
fi
