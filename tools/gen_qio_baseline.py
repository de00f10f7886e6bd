#!/usr/bin/env python3
"""Snapshot bench_full.json's per-query IO ledger into QIO_BASELINE.json.

The committed snapshot is the reference side of QioLedgerSpec's
whole-registry shuffle-byte envelope: regenerate it ONLY when a plan
change is intentional (the diff is the review trail), in the same commit
as the change.

Usage: python3 tools/gen_qio_baseline.py [bench_full.json] [QIO_BASELINE.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "QIO_BASELINE.json"

with open(src) as f:
    bench = json.load(f)

qio = bench.get("qio", {})
out = {
    "sf": bench.get("sf"),
    "note": "committed reference for QioLedgerSpec; regenerate via "
            "tools/gen_qio_baseline.py in the same commit as an "
            "intentional plan change",
    "shuffle_write": {k: v.get("shuffle_write", 0) for k, v in sorted(qio.items())},
    "spill": {k: v.get("spill", 0) for k, v in sorted(qio.items())},
}
with open(dst, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote {dst}: {len(out['shuffle_write'])} queries, "
      f"{sum(1 for v in out['spill'].values() if v > 0)} spillers")
