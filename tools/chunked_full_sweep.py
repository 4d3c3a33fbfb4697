"""Full-registry sweep in fresh-JVM chunks — the sf100 protocol.

Usage: python tools/chunked_full_sweep.py SF_DIR TIMEOUT_S [N_CHUNKS]

Why not one ``full_sweep.py`` app: within a single application, shuffle
files live until the ContextCleaner happens to GC the frames that own
them — at sf100 the output-quadratic dedup queries each write 20-30 GB
of shuffle, so a 50-query single-app sweep can exhaust local disk on
ACCUMULATED shuffle files even though every individual query fits. Each
chunk here runs ``subset_sweep.py`` in its own JVM (shuffle dirs are
wiped at app exit), and queries are dealt round-robin across chunks so
the heavy ``dedup_*`` family — adjacent in sorted order — lands in
DIFFERENT chunks instead of one. A fresh JVM per chunk also isolates
any leaked cancelled-query thread to its own chunk (full_sweep's
``tainted_by`` rows can never cross a chunk boundary).

Merges the chunk outputs into one full_sweep-shaped JSON line on
stdout (queries keyed by name; per-chunk JVM startup is excluded from
``total_sec``, which sums per-query seconds exactly like full_sweep).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bigdataproject_spark.queries import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    names = sorted(registry())
    chunks = [names[i::n_chunks] for i in range(n_chunks)]

    from sweeplib import apply_scale_env

    env = {**os.environ, "PYTHONPATH": REPO_ROOT}
    apply_scale_env(sf_dir, env)

    merged: dict[str, dict] = {}
    leaked: list[str] = []
    controls: list[float] = []
    for i, chunk in enumerate(c for c in chunks if c):
        print(f"-- chunk {i}: {chunk}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO_ROOT, "tools", "subset_sweep.py"),
                sf_dir,
                str(timeout_s),
                *chunk,
            ],
            capture_output=True,
            text=True,
            env=env,
        )
        line = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not line:
            for n in chunk:
                merged[n] = {
                    "error": f"chunk died rc={proc.returncode}: "
                    + proc.stderr[-200:].replace("\n", " ")
                }
            continue
        out = json.loads(line[-1])
        merged.update(out["queries"])
        leaked.extend(out.get("leaked_threads", []))
        if out.get("control_sec") is not None:
            controls.append(out["control_sec"])

    import statistics

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "timeout_s": timeout_s,
                "n_chunks": n_chunks,
                "protocol": "fresh JVM per chunk (subset_sweep), "
                "round-robin assignment",
                "leaked_threads": leaked,
                # per-JVM frozen-control medians (one per chunk, chunk
                # order): the median normalizes the whole sweep; the
                # spread bounds box drift across chunks
                "control_sec": (
                    round(statistics.median(controls), 3)
                    if controls
                    else None
                ),
                "control_sec_per_chunk": controls,
                "queries": merged,
                "total_sec": round(
                    sum(q.get("sec", 0.0) for q in merged.values()), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
