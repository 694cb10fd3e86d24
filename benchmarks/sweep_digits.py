"""Perf sweep: encryption throughput vs (digit width, batch size).

Must be run as separate processes per digit width (RingPlan caches and
jit caches key on the plan)."""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

for nd in (5, 6, 8):
    for batch in (256, 512, 1024):
        env = dict(os.environ, PVW_NUM_DIGITS=str(nd))
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"), "--batch", str(batch)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            val = json.loads(line)["value"]
        except Exception:
            val = f"FAIL: {r.stderr.strip().splitlines()[-1] if r.stderr else '?'}"
        print(f"nd={nd} batch={batch}: {val}", flush=True)
