"""Steady-state IVF measurement: build the materialized cell-partitioned
index ONCE, then run N query batches against it — the production shape
(`ivf_write_index` / `ivf_topk_indexed`), as opposed to the registry's
self-contained `ann_ivf_topk` which refits the quantizer per call.

Usage: python tools/ivf_bench.py SF_DIR [N_BATCHES] [IDX_DIR]

Prints one JSON line: {"build_sec": ..., "batches": [sec, ...],
"batch_median_sec": ..., "corpus_n": ..., "queries_per_batch": ...}.
Each batch is a disjoint deterministic ~BATCH_TARGET-query slice of
the embedding table (id % M == b with M sized from the corpus), forced
end-to-end with a noop sink — the realistic steady-state shape: a
search service answers bounded query batches against a big corpus,
not corpus-sized self-joins (ivf_topk_indexed broadcasts the probe
side, so the batch must stay inside the broadcast budget — see its
docstring)."""
from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

from sweeplib import force  # noqa: E402 (sys.path bootstrap)

from pyspark.sql import functions as F

from bigdataproject_spark.operators.simsearch import (
    ivf_topk_indexed,
    ivf_write_index,
    release_search_broadcasts,
)
from bigdataproject_spark.session import get_spark
from bigdataproject_spark.sources.readers import load_table

N_CENTROIDS = 64
N_PROBE = 8
K = 10
BATCH_TARGET = 2000  # queries per batch


def main() -> None:
    sf_dir = sys.argv[1]
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    idx = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ivf_idx"
    shutil.rmtree(idx, ignore_errors=True)
    spark = get_spark("ivf-bench")
    emb = load_table(spark, sf_dir, "embeddings")
    idc = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
    vc = "embedding" if "embedding" in emb.columns else emb.columns[1]
    corpus_n = emb.count()

    t0 = time.perf_counter()
    ivf_write_index(
        emb, idx, id_col=idc, vec_col=vc, n_centroids=N_CENTROIDS
    )
    build_sec = time.perf_counter() - t0

    batches = []
    batches_blas = []
    q_per_batch = None
    m = max(n_batches, corpus_n // BATCH_TARGET)
    for b in range(n_batches):
        queries = emb.filter(F.pmod(F.col(idc), F.lit(m)) == b)
        if q_per_batch is None:
            q_per_batch = queries.count()
        for impl, sink in (("native", batches), ("blas", batches_blas)):
            t0 = time.perf_counter()
            force(
                ivf_topk_indexed(
                    spark, idx, queries, id_col=idc, vec_col=vc, k=K,
                    n_probe=N_PROBE, impl=impl,
                )
            )
            sec = time.perf_counter() - t0
            sink.append(round(sec, 2))
            print(f"  batch {b} ({impl}): {sec:.2f}s", file=sys.stderr, flush=True)
        # steady-state hygiene: per-batch query-block broadcasts are
        # released once the batch's results are consumed
        release_search_broadcasts(spark)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_n": corpus_n,
                "n_centroids": N_CENTROIDS,
                "n_probe": N_PROBE,
                "k": K,
                "build_sec": round(build_sec, 2),
                "queries_per_batch": q_per_batch,
                "batches": batches,
                "batch_median_sec": round(statistics.median(batches), 2),
                "batches_blas": batches_blas,
                "batch_median_sec_blas": round(
                    statistics.median(batches_blas), 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
