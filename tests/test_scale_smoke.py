"""Driver-RSS-bounded scale smoke test (VERDICT r4 item 5).

Runs ~10× bench volume — a 10^6-id frontier-wave distinct, exact dedup,
and the tokenizer/vocab family over a 500k-doc corpus whose vocabulary
EXCEEDS relops.BROADCAST_LIMIT (so the distributed token-hash paths are
the ones exercised) — in a SUBPROCESS with its own Ray driver, and
asserts that driver process's peak RSS (VmHWM) stays under a fixed
bound. This is the test that would have caught the round-3
vocabulary-sized driver collects a round earlier, and will catch the
next unbounded ``to_pandas`` before sf-scale hides it.

Gated: set ``FSRAY_SCALE_SMOKE=1`` to run (bench/nightly mode); skipped
otherwise (runs ~2-4 min at 8 CPUs).
"""

import os
import subprocess
import sys

import pytest

#: peak driver RSS bound, KB. Measured clean: ~580 MB (Ray driver
#: baseline + gRPC + small collected results). A vocabulary-sized
#: collect of the ~2.7M-distinct-token DF table would add ≥0.7 GB and
#: trip this.
_RSS_BOUND_KB = 1_200_000

_CHILD = r"""
import re
import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data

from fs_crawler_ray.engine import configure_data_context

configure_data_context()
ray.data.DataContext.get_current().enable_progress_bars = False

N_DOCS = 500_000
TOKENS_PER_DOC = 40
TOKEN_SPACE = 10_000_000  # ~2.7M distinct draws >> BROADCAST_LIMIT


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
    toks = rng.integers(0, TOKEN_SPACE, size=(len(ids), TOKENS_PER_DOC))
    texts = [" ".join(map(str, row)) for row in toks]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


docs = ray.data.range(N_DOCS, override_num_blocks=64).map_batches(
    gen, batch_format="pyarrow").materialize()

# 10^6-row frontier-wave distinct (the wave's dedup shuffle shape)
from fs_crawler_ray.relops import distinct

frontier = ray.data.range(1_000_000, override_num_blocks=32).map_batches(
    lambda t: pa.table({"id": pa.compute.binary_join_element_wise(
        pa.compute.cast(t["id"], pa.string()), pa.scalar("-X"), "")}),
    batch_format="pyarrow")
n_front = distinct(frontier, ["id"], 32).count()
assert n_front == 1_000_000, n_front

# cardinality sketch over the 1M-id wave: fixed 2^p-byte state
from fs_crawler_ray.sketch import hll_distinct

hll = hll_distinct(frontier, "id")
assert abs(hll["est"][0].as_py() - 1_000_000) / 1_000_000 < 0.05

# exact dedup family
from fs_crawler_ray.text import exact_dedup, tfidf_top_terms, token_rarity

n_uniq = exact_dedup(docs).count()
assert n_uniq > 0

# vocab family — vocabulary > BROADCAST_LIMIT, so these MUST take the
# distributed path (driver never sees a vocabulary-sized table)
n_tfidf = tfidf_top_terms(docs, top_n=2).count()
assert n_tfidf > 0
n_rar = token_rarity(docs).count()
assert n_rar == N_DOCS, n_rar

ray.shutdown()
hwm_kb = int(re.search(r"VmHWM:\s+(\d+)",
                       open("/proc/self/status").read()).group(1))
print(f"DRIVER_VMHWM_KB={hwm_kb}")
"""


@pytest.mark.scale_smoke
@pytest.mark.skipif(os.environ.get("FSRAY_SCALE_SMOKE") != "1",
                    reason="set FSRAY_SCALE_SMOKE=1 (bench/nightly mode)")
def test_driver_rss_bounded_at_10x_bench_volume(tmp_path):
    script = tmp_path / "scale_smoke_child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # own local session, not the test one
    env["PYTHONPATH"] = "/root/repo"  # script lives in tmp; workers cwd-resolve
    proc = subprocess.run(
        [sys.executable, str(script)], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("DRIVER_VMHWM_KB=")]
    assert line, proc.stdout[-2000:]
    hwm = int(line[-1].split("=")[1])
    assert hwm < _RSS_BOUND_KB, (
        f"driver peak RSS {hwm} KB ≥ bound {_RSS_BOUND_KB} KB — an "
        f"unbounded driver-side collect crept into the wave/dedup/vocab "
        f"paths")
