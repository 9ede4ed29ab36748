"""sf1 memory smoke (VERDICT r4 follow-on, round-5 item 9).

One flagship run over the 6M-row / ~42 GB-decompressed sf1 fixture
corpus at 32 CPUs in the 128 GiB sandbox: validates the phased-mode
object-store gate + spill behavior at 10x bench scale and records
wall, rows/s, triples/s and peak object-store usage for BASELINE.md.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from kgray import fixtures, pipeline

t0 = time.monotonic()
corpus_dir = fixtures.corpus_path("sf1")
gen_s = time.monotonic() - t0
print(f"corpus ready in {gen_s:.1f}s at {corpus_dir}", flush=True)

total_store = ray.cluster_resources().get("object_store_memory", 0.0)
peak = {"used": 0.0}
stop_evt = threading.Event()


def poll():
    while not stop_evt.is_set():
        avail = ray.available_resources().get("object_store_memory", total_store)
        used = total_store - avail
        if used > peak["used"]:
            peak["used"] = used
        stop_evt.wait(0.5)


th = threading.Thread(target=poll, daemon=True)
th.start()

n_rows = fixtures.SCALES["sf1"]
# keep blocks at the measured-good ~4700 rows / ~35 MB decompressed:
# scale the bench block count (128 at 600k) linearly with rows
blocks = max(128, round(4 * 32 * n_rows / fixtures.SCALES["bench"]))
t0 = time.monotonic()
triples = pipeline.flagship(corpus_dir, fixtures.vocab_path(),
                            override_num_blocks=blocks, with_sha=True)
n = triples.count()
wall = time.monotonic() - t0
stop_evt.set()
th.join(timeout=2)

res = {
    "scale": "sf1",
    "rows": n_rows,
    "num_blocks": blocks,
    "gen_s": round(gen_s, 1),
    "wall_s": round(wall, 2),
    "rows_per_s": round(n_rows / wall, 1),
    "triples": n,
    "triples_per_s": round(n / wall, 1),
    "object_store_total_gb": round(total_store / 2**30, 2),
    "object_store_peak_gb": round(peak["used"] / 2**30, 2),
    "num_cpus": 32,
}
print("SF1_SMOKE " + json.dumps(res), flush=True)
with open("/tmp/sf1_smoke.json", "w") as f:
    json.dump(res, f, indent=1)
ray.shutdown()
