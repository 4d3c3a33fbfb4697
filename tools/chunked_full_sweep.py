"""Full-registry sweep in fresh-JVM chunks — the sf100 protocol.

Usage: python tools/chunked_full_sweep.py SF_DIR TIMEOUT_S [N_CHUNKS]

Why not one ``full_sweep.py`` app: within a single application, shuffle
files live until the ContextCleaner happens to GC the frames that own
them — at sf100 the output-quadratic dedup queries each write 20-30 GB
of shuffle, so a 50-query single-app sweep can exhaust local disk on
ACCUMULATED shuffle files even though every individual query fits. Each
chunk here runs ``subset_sweep.py`` in its own JVM (shuffle dirs are
wiped at app exit). Queries are dealt by a STABLE NAME HASH
(md5("v3:" + name) mod n_chunks — r11, per the r10 verdict's item 4):
the r10 sweep showed that sorted-order round-robin re-deals EVERY
chunk whenever one query is renamed, moving the heaviest queries'
JVM co-residents and with them their wall-times (embedding_neardup
1279 → 1713 s with byte-identical plans). With the name-hash deal a
rename or addition moves ONLY that query; every carried query keeps
its co-residents forever. The "v3:" salt was chosen once (and is now
part of the protocol) because it spreads the heavy shuffle queries —
embedding_neardup, dedup_ngram_jaccard, dedup_minhash_lsh,
span_dedup_report, energy_timeline_nested — into five different
chunks at the current registry. A fresh JVM per chunk also isolates
any leaked cancelled-query thread to its own chunk (full_sweep's
``tainted_by`` rows can never cross a chunk boundary).

Merges the chunk outputs into one full_sweep-shaped JSON line on
stdout (queries keyed by name; per-chunk JVM startup is excluded from
``total_sec``, which sums per-query seconds exactly like full_sweep).
"""
from __future__ import annotations

import hashlib
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
    chunks: list[list[str]] = [[] for _ in range(n_chunks)]
    for n in names:  # stable name-hash deal — rename-proof (see header)
        h = int(hashlib.md5(f"v3:{n}".encode()).hexdigest(), 16)
        chunks[h % n_chunks].append(n)

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
                "name-hash deal md5('v3:'+name) % n_chunks — "
                "rename-stable co-residents (r11)",
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
