#!/bin/bash
# Scaling-evidence protocol (BASELINE.md step 2): same job, same input,
# two parallelism levels, separate JVMs per run. Raw results append to
# BENCH/scaling_raw.jsonl; BENCH/BASELINE.md summarizes.
cd "$(dirname "$0")/.."
OUT=BENCH/scaling_raw.jsonl
: > "$OUT"
for rep in 1 2 3; do
  for cores in 2 8; do
    echo "== frontier rep=$rep cores=$cores" >&2
    python bench.py --frontier-only --frontier-urls 4000000 --cores $cores 2>/dev/null \
      | tail -1 | python -c "import json,sys; d=json.load(sys.stdin); d['rep']=$rep; print(json.dumps(d))" >> "$OUT"
  done
done
for cores in 32; do
  echo "== frontier cores=$cores" >&2
  python bench.py --frontier-only --frontier-urls 4000000 --cores $cores 2>/dev/null \
    | tail -1 | python -c "import json,sys; d=json.load(sys.stdin); d['rep']=1; print(json.dumps(d))" >> "$OUT"
done
for cores in 2 8 32; do
  echo "== crawl cores=$cores" >&2
  python bench.py --crawl-only --cores $cores 2>/dev/null \
    | tail -1 | python -c "import json,sys; d=json.load(sys.stdin); d['rep']=1; print(json.dumps(d))" >> "$OUT"
done
echo done >&2
