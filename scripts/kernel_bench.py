"""Reproduce the engine kernel numbers recorded in BASELINE.md.

Single-core pairs/s for each kernel over seeded random pairs (same seeds as
the reference's accuracy benchmark, `/root/reference/benchmark.py:210-212`),
plus Vincenty-vs-Karney accuracy stats and the pinned golden values.

No Ray involved — these are the pure NumPy kernels that run inside
``map_batches``; multiply by cores × parallel-efficiency (bench.py
--scaling) for pipeline-level throughput.

Usage: python scripts/kernel_bench.py [n_pairs]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from geodistpy_ray.kernels import geodesic_inverse, karney_inverse
from geodistpy_ray.kernels.sphere import great_circle, haversine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

rng1 = np.random.default_rng(100)
rng2 = np.random.default_rng(200)
lat1 = rng1.uniform(-85, 85, N)
lon1 = rng1.uniform(-180, 180, N)
lat2 = rng2.uniform(-85, 85, N)
lon2 = rng2.uniform(-180, 180, N)

out = {"n_pairs": N}

for name, fn in [
    ("haversine", lambda: haversine(lat1, lon1, lat2, lon2)),
    ("great_circle", lambda: great_circle(lat1, lon1, lat2, lon2)),
    ("vincenty_exact", lambda: geodesic_inverse(lat1, lon1, lat2, lon2)),
]:
    fn()  # warm (allocator, caches)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    out[f"{name}_pairs_per_sec_core"] = round(N / sorted(samples)[1])

# accuracy: Vincenty(+Karney patch) vs pure Karney on 5000 pairs
M = 5000
dv = geodesic_inverse(lat1[:M], lon1[:M], lat2[:M], lon2[:M])
dk = karney_inverse(lat1[:M], lon1[:M], lat2[:M], lon2[:M])[0]
err = np.abs(dv - dk)
out["vincenty_vs_karney_mean_abs_m"] = float(np.mean(err))
out["vincenty_vs_karney_max_abs_m"] = float(np.max(err))

# pinned goldens (reference test suite values)
gold = {
    "berlin_paris_m": (52.5200, 13.4050, 48.8566, 2.3522, 879699.316),
    "pole_to_pole_m": (90.0, 0.0, -90.0, 0.0, 20003931.458623),
}
for k, (a, b, c, d, want) in gold.items():
    got = float(geodesic_inverse(np.array([a]), np.array([b]), np.array([c]), np.array([d]))[0])
    out[k] = {"engine": round(got, 3), "reference": want, "abs_err_m": round(abs(got - want), 6)}

# text-dedup signature kernels (round 2: uint64 split-multiply MinHash and
# batched-reduceat SimHash replaced Python-bigint / per-token loops; round
# 3: Arrow-vectorized shingle front-end + one-permutation-hashing default —
# minhash128_docs_per_sec_core tracks the DEFAULT engine path)
from geodistpy_ray.stages.dedup import MinHasher, simhash64_batch

_docs = [
    " ".join(f"w{(i * 31 + j * 7) % 997}" for j in range(120)) for i in range(512)
]
for _scheme, _key in (
    ("oph", "minhash128_docs_per_sec_core"),
    ("classic", "minhash128_classic_docs_per_sec_core"),
):
    _m = MinHasher(num_perm=128, scheme=_scheme)
    _m.signatures(_docs[:8])  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _m.signatures(_docs)
        samples.append(time.perf_counter() - t0)
    out[_key] = round(len(_docs) / sorted(samples)[1])

simhash64_batch(_docs[:8])  # warm
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    simhash64_batch(_docs)
    samples.append(time.perf_counter() - t0)
out["simhash_docs_per_sec_core"] = round(len(_docs) / sorted(samples)[1])

# lang-ID (round 4: Arrow split + dictionary_encode + per-UNIQUE-token
# profile probe replaced the per-doc tokenize loop; the loop is kept as
# _predict_loop for the parity row)
import pyarrow as pa

from geodistpy_ray.stages.text import _LANG_PROFILES, LangIdActor

_lrng = np.random.default_rng(5)
_lwords = np.array(
    sorted(set().union(*_LANG_PROFILES.values())) + [f"w{i}" for i in range(2000)],
    dtype=object,
)
_ldocs = [" ".join(_lrng.choice(_lwords, size=60)) for _ in range(8192)]
_lbatch = pa.table({"text": pa.array(_ldocs, pa.string())})
_actor = LangIdActor()
assert _actor(_lbatch).column("lang_pred").to_pylist() == _actor._predict_loop(_ldocs)
for _key, _fn in (
    ("langid_docs_per_sec_core", lambda: _actor(_lbatch)),
    ("langid_loop_docs_per_sec_core", lambda: _actor._predict_loop(_ldocs)),
):
    _fn()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _fn()
        samples.append(time.perf_counter() - t0)
    out[_key] = round(len(_ldocs) / sorted(samples)[1])

# round-4 session-2 geo kernels: spherical ring area (Chamberlain–Duquette
# over list offsets), great-circle cross-track deviation (the DP
# simplification inner loop), and slerp interpolation (densify)
from geodistpy_ray.kernels.simplify import cross_track_distance

cross_track_distance(lat1[:8], lon1[:8], 0.0, 0.0, 10.0, 10.0)  # warm
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    cross_track_distance(lat1, lon1, 0.0, 0.0, 10.0, 10.0)
    samples.append(time.perf_counter() - t0)
out["cross_track_pairs_per_sec_core"] = round(N / sorted(samples)[1])

from geodistpy_ray.cells import cell_area_km2

_cells = (np.arange(N, dtype=np.int64) * 7919) % 16200
cell_area_km2(_cells[:8], 2.0)  # warm
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    cell_area_km2(_cells, 2.0)
    samples.append(time.perf_counter() - t0)
out["cell_area_cells_per_sec_core"] = round(N / sorted(samples)[1])

# session-2 navigation kernels: loxodrome inverse, spherical direct, and
# the corridor segment distance
from geodistpy_ray.kernels.simplify import gc_segment_distance
from geodistpy_ray.kernels.sphere import destination_sphere, rhumb_inverse

bearing = lon2 % 360.0  # hoisted: the mod must not be charged to the kernel

for name, fn in [
    ("rhumb_pairs_per_sec_core", lambda: rhumb_inverse(lat1, lon1, lat2, lon2)),
    ("sphere_direct_pairs_per_sec_core", lambda: destination_sphere(lat1, lon1, bearing, 1e5)),
    ("segment_dist_pairs_per_sec_core", lambda: gc_segment_distance(lat1, lon1, 40.0, -5.0, 48.0, 10.0)),
]:
    fn()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    out[name] = round(N / sorted(samples)[1])

print(json.dumps(out, indent=2))
