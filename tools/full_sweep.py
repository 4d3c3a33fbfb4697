"""Full-registry sweep at a given SF dir: every queries() entry once,
wall seconds + shuffle byte deltas, with a per-query watchdog.

Usage: python tools/full_sweep.py SF_DIR [TIMEOUT_S]

The headline sweep (tools/scale_sweep.py) covers the 12 bench queries
with medians; this one answers a different question — does EVERY
registered query still complete, and with a sane plan, at 100x? A
query that exceeds TIMEOUT_S (default 600) is cancelled via its job
group and recorded as {"timeout": true} instead of wedging the sweep.

Prints one JSON line:
  {"sf_dir": ..., "timeout_s": ..., "queries": {name: {"sec": ...,
   "shuffle_write_mb": ..., "shuffle_read_mb": ...} | {"timeout": true}
   | {"error": "..."}}, "total_sec": ...}
"""
from __future__ import annotations

import json
import sys
import threading
import time

import os
import statistics

from sweeplib import (  # noqa: E402 (sys.path bootstrap lives here)
    active_stage_count,
    apply_scale_env,
    control_samples,
    force as _force,
    shuffle_totals,
)

from bigdataproject_spark.queries import registry
from bigdataproject_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    apply_scale_env(sf_dir, os.environ)  # before the session is built
    spark = get_spark(
        "full-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    base_url = sc.uiWebUrl
    reg = registry()

    # frozen environment control, BEFORE and AFTER the sweep (r8
    # VERDICT item 5): the headline bench normalizes box drift by a
    # control median; the sweep previously could not — a +12% wall on
    # byte-identical plans needed manual adjudication. Two sample
    # points bound drift ACROSS the sweep window too. The before-run
    # also absorbs JVM/codegen warmup, the role bench.py's warmup
    # query plays.
    ctl_before = control_samples(spark, sf_dir)

    out: dict[str, dict] = {}
    leaked: list[str] = []  # queries whose thread survived cancel+drain
    for name in sorted(reg):
        w0, r0 = shuffle_totals(base_url)
        result: dict = {}
        err: list[BaseException] = []

        def run(q=reg[name], group=name) -> None:
            sc.setJobGroup(group, group, interruptOnCancel=True)
            try:
                _force(q.fn(spark, sf_dir))
            except BaseException as ex:  # noqa: BLE001 — recorded below
                err.append(ex)
            finally:
                sc.setJobGroup("", "")

        t0 = time.perf_counter()
        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        sec = time.perf_counter() - t0
        if th.is_alive():
            sc.cancelJobGroup(name)
            th.join(60)
            # drain: cancellation is async — let the cancelled query's
            # in-flight stages finish before the next query's timing /
            # shuffle-delta window opens, or they pollute its row.
            drain_t0 = time.monotonic()
            while (
                active_stage_count(base_url) > 0
                and time.monotonic() - drain_t0 < 120
            ):
                time.sleep(2)
            result = {"timeout": True, "sec": round(sec, 1)}
            if th.is_alive():
                # cancel+drain failed (e.g. a stage wedged in a
                # non-interruptible native call): the leaked daemon
                # thread's stages pollute every later row's wall time
                # and shuffle deltas — record it so those rows are
                # marked tainted instead of silently trusted.
                leaked.append(name)
                result["leaked_thread"] = True
        elif err:
            # a cancelled-job error after our own cancel is still a timeout
            result = {"error": f"{type(err[0]).__name__}: {err[0]}"[:300]}
        else:
            w1, r1 = shuffle_totals(base_url)
            result = {
                "sec": round(sec, 2),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            }
        if leaked and name not in leaked:
            result["tainted_by"] = list(leaked)
        out[name] = result
        print(f"  {name}: {result}", file=sys.stderr, flush=True)

    ctl_after = control_samples(spark, sf_dir)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "timeout_s": timeout_s,
                "leaked_threads": leaked,
                "control_sec": round(
                    statistics.median(ctl_before + ctl_after), 3
                ),
                "control_sec_before": round(statistics.median(ctl_before), 3),
                "control_sec_after": round(statistics.median(ctl_after), 3),
                "queries": out,
                "total_sec": round(
                    sum(q.get("sec", 0.0) for q in out.values()), 1
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
