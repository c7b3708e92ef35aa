"""Host-side BA problem-assembly cost at survey scale (VERDICT r3 weak #2).

ba_problem_arrays used to build its index maps with per-observation Python
dict lookups — O(obs) interpreter work per global BA (~0.5 s at the 344k-
obs scale). The fix is np.searchsorted over the sorted id arrays. This
probe times both mappings on a 500-image-scale observation table so the
win stays recorded.

Usage: python benchmarks/ba_host_assembly.py [num_images]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
OBS_PER_IMG = 700
rng = np.random.default_rng(0)

image_ids = np.arange(0, 2 * N, 2, dtype=np.int64)      # sparse store ids
point_ids = np.sort(rng.choice(10_000_000, size=60 * N, replace=False))
O = N * OBS_PER_IMG
obs_img_raw = np.repeat(image_ids, OBS_PER_IMG)
obs_pt_raw = point_ids[rng.integers(0, len(point_ids), O)]


def t(fn, reps=3):
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


def dict_way():
    id_to_row = {iid: k for k, iid in enumerate(image_ids)}
    pid_to_row = {int(p): k for k, p in enumerate(point_ids)}
    oi = np.array([id_to_row[int(i)] for i in obs_img_raw], np.int32)
    op = np.array([pid_to_row[int(p)] for p in obs_pt_raw], np.int32)
    return oi, op


def searchsorted_way():
    oi = np.searchsorted(image_ids, obs_img_raw).astype(np.int32)
    op = np.searchsorted(point_ids, obs_pt_raw).astype(np.int32)
    return oi, op


dt_dict, a = t(dict_way)
dt_ss, b = t(searchsorted_way)
assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
print(f"N={N} images, {O} observations, {len(point_ids)} points:")
print(f"  dict lookups : {dt_dict * 1000:.1f} ms per global BA")
print(f"  searchsorted : {dt_ss * 1000:.1f} ms per global BA "
      f"({dt_dict / max(dt_ss, 1e-9):.0f}x)")
