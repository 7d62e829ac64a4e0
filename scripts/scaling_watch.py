"""Probe-gated scaling runner: poll the host latency probe and launch the
bench.py --scaling protocol (2<->8, 3 interleaved cycles, 400k pages) as soon
as a quiet window appears (median probe <= threshold).  One run per
invocation; results land in the artifact path given by BENCH_SCALING_OUT
(default bench_artifacts/scaling_r5a.json), journal alongside.

Run: PYTHONPATH=/root/repo python scripts/scaling_watch.py [max_wait_min]
Env: SCALING_PROBE_MS (default 4.5), BENCH_SCALING_REPEATS (default 3).
"""
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

THRESH = float(os.environ.get("SCALING_PROBE_MS", "4.5"))
MAX_WAIT_MIN = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
OUT = os.path.abspath(
    os.environ.get("BENCH_SCALING_OUT", "/root/repo/bench_artifacts/scaling_r5a.json")
)
if not OUT.endswith(".json"):
    # keep the journal path distinct from the artifact path (a suffix-less
    # OUT would make .replace('.json', ...) a no-op and mix jsonl into it)
    OUT += ".json"


def probe3() -> float:
    vals = []
    for _ in range(3):
        vals.append(bench._latency_probe_ms())
        time.sleep(1)
    return statistics.median(vals)


t0 = time.time()
while True:
    p = probe3()
    print(f"[watch] probe median {p:.2f} ms (threshold {THRESH})", flush=True)
    if p <= THRESH:
        break
    if (time.time() - t0) / 60 > MAX_WAIT_MIN:
        if os.environ.get("SCALING_WATCH_STRICT"):
            print("[watch] max wait exceeded; STRICT mode — exiting without a "
                  "run (no artifact written)", flush=True)
            sys.exit(3)
        print("[watch] max wait exceeded; launching anyway (window still noisy)",
              flush=True)
        break
    time.sleep(60)

env = dict(
    os.environ,
    BENCH_SCALING_CPUS="2,8",
    BENCH_SCALING_REPEATS=os.environ.get("BENCH_SCALING_REPEATS", "3"),
    BENCH_SCALING_JOURNAL=OUT.replace(".json", "_journal.jsonl"),
)
print(f"[watch] starting scaling run -> {OUT}", flush=True)
r = subprocess.run(
    [sys.executable, "/root/repo/bench.py", "--scaling"],
    env=env, capture_output=True, text=True, cwd="/root/repo",
)
line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
if r.returncode != 0:
    # Do NOT write the artifact: a traceback fragment or partial line would
    # masquerade as a well-formed result to later readers of OUT.
    print("[watch] bench.py --scaling FAILED (no artifact written)", flush=True)
    print(r.stderr[-2000:], flush=True)
    sys.exit(r.returncode)
try:
    parsed = json.loads(line)
    assert "scaling_efficiency" in parsed
except Exception:
    print("[watch] last stdout line is not a scaling JSON (no artifact written):",
          line[:500], flush=True)
    sys.exit(2)
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    f.write(line + "\n")
print("[watch] done:", line, flush=True)
