"""One-off serving-scale probe: time IvfPqIndex.search() ALONE over a
prebuilt standing index at two corpus scales (sf0.1 = 2 k vectors,
.sf10 tiles = 200 k vectors — 100x), same geometry as bench.py's
ann_serving_search entry.

The claim under test (r13 verdict "what's missing" #3): serving stays
~flat under corpus growth because a probe reads nprobe/num_centroids of
a COMPRESSED partition-pruned code tree and never touches a raw vector
— the per-probe cost is O(nprobe * cell_size * m), and cell size grows
linearly with corpus only within the probed cells.  This script turns
the structural claim into a measured number, recorded in PARITY_sf10.md
and BASELINE.md.

Usage: python tools/serving_scale_probe.py [SF_DIR ...]
Defaults: /root/testdata/sf0.1 /root/repo/.sf10

Build (train + encode) is UNTIMED by design — bench.py's
ann_ivfpq_topk already times the in-plan train+encode pipeline, and the
r13 ann_serving_search entry established that ~90% of that entry is
verification work.  Warm protocol: one throwaway probe populates the
session/manifest caches, then min-of-3 timed probes (the bench
discipline).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from datalake_spark.operators.ann_index import IvfPqIndex  # noqa: E402
from datalake_spark.queries import load  # noqa: E402
from datalake_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    root = tempfile.mkdtemp(prefix="serving_scale_probe_")
    try:
        idx = IvfPqIndex(
            spark, root, num_centroids=16, m=32, ksub=32, train_iters=2
        )
        t0 = time.time()
        idx.build(emb.filter("vec_id >= 3"))
        build_s = time.time() - t0
        q = load(spark, sf_dir, "embeddings").filter("vec_id < 3")
        # warm pass (manifest + FS caches), then min-of-3
        idx.search(q, k=3, nprobe=4).collect()
        best = None
        for _ in range(3):
            t0 = time.time()
            rows = idx.search(q, k=3, nprobe=4).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return {
            "sf_dir": sf_dir,
            "corpus": n,
            "build_sec": round(build_s, 2),
            "search_sec_min3": round(best, 3),
            "rows": len(rows),
        }
    finally:
        # the .sf10 index is ~200 k encoded vectors of /tmp debris per
        # run — a one-off probe must clean up after itself
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.sf10"]
    spark = get_spark()
    out = [probe(spark, d) for d in dirs]
    for r in out:
        print(json.dumps(r))
    if len(out) == 2 and out[0]["search_sec_min3"] > 0:
        ratio = out[1]["search_sec_min3"] / out[0]["search_sec_min3"]
        scale = out[1]["corpus"] / max(out[0]["corpus"], 1)
        print(
            json.dumps(
                {"corpus_scale": scale, "search_time_ratio": round(ratio, 2)}
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
