"""Measure ivf_pq_batch_topk's DRIVER stage: interpreted per-pair
loops (the r10 implementation) vs the r11 dimension-major numpy folds —
probe selection + LUT construction only, no Spark session involved.

Also the bit-parity witness at scale: the vectorized stage must produce
EXACTLY the same probe choices and LUT doubles as the per-pair
``_py_dot``/``_subspace_luts`` arithmetic (same multiply/add roundings
in the same order), asserted over every query before timings print.

Run: ``python tools/batch_ann_driver_probe.py [n_queries]``
(default 2_000 — the largest residual workload under the 512 MiB
closure cap at this geometry; past the cap ivf_pq_batch_topk raises
and callers chunk. The parity assertion runs on min(n, 512) queries —
the interpreted path is the reason this probe exists. A warm-up pass
touches the LUT pages first so one-time OS faulting doesn't pollute
the steady-state timing.)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ons_utils_spark.operators.pq import (  # noqa: E402
    _batch_driver_stage,
    _subspace_luts,
)
from ons_utils_spark.operators.semantic import _py_dot  # noqa: E402

# FAISS-standard serving geometry (the scale the module advertises).
DIM = 64
N_LISTS = 64
M = 16
K = 256
SUB_D = DIM // M
N_PROBE = 8


def old_driver_stage(Q, coarse, cbs):
    """The r10 interpreted stage, verbatim arithmetic."""
    probes, luts = [], []
    for q in Q:
        q = [float(v) for v in q]
        qq = _py_dot(q, q)
        by_dist = sorted(
            (qq + _py_dot(c, c) - 2 * _py_dot(q, c), j)
            for j, c in enumerate(coarse)
        )
        probe = [j for _, j in by_dist[:N_PROBE]]
        probes.append(probe)
        luts.append([
            _subspace_luts([qv - cv for qv, cv in zip(q, coarse[l])], cbs)
            for l in probe
        ])
    return probes, luts


def new_driver_stage(Qa, CCa, cb_arrs):
    """The PRODUCTION vectorized stage — pq._batch_driver_stage itself,
    so the parity assertion below covers the shipped code, not a
    re-implementation of it."""
    return _batch_driver_stage(Qa, CCa, cb_arrs, N_PROBE, True)


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    rng = np.random.default_rng(7)
    Qa = rng.standard_normal((n_q, DIM))
    CCa = rng.standard_normal((N_LISTS, DIM))
    cb_arrs = [rng.standard_normal((K, SUB_D)) for _ in range(M)]
    coarse = [list(map(float, c)) for c in CCa]
    cbs = [[list(map(float, c)) for c in cb] for cb in cb_arrs]

    new_driver_stage(Qa[:64], CCa, cb_arrs)  # warm-up: page-fault once

    n_par = min(n_q, 512)
    t0 = time.perf_counter()
    probes_old, luts_old = old_driver_stage(Qa[:n_par], coarse, cbs)
    t_old_par = time.perf_counter() - t0

    # min-of-3: this host's wall-clock is wildly noisy (first-touch
    # page faults on the ~0.5 GiB LUT block + co-tenancy), and the
    # interpreted baseline inflates under the same noise.
    t_new_full = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe_mat, lut_all = new_driver_stage(Qa, CCa, cb_arrs)
        t_new_full = min(t_new_full, time.perf_counter() - t0)

    for qi in range(n_par):
        assert list(probe_mat[qi]) == probes_old[qi], f"probe diverged q{qi}"
        want = np.asarray(luts_old[qi], dtype=np.float64)
        got = lut_all[qi]
        assert (want == got).all(), f"LUT doubles diverged q{qi}"
    print(f"parity: probes + LUTs bit-identical over {n_par} queries")
    per_q_old = t_old_par / n_par
    print(
        f"interpreted stage: {t_old_par:.2f}s for {n_par} queries "
        f"({per_q_old * 1000:.1f} ms/query -> "
        f"~{per_q_old * n_q:.0f}s projected at {n_q})"
    )
    print(f"vectorized stage:  {t_new_full:.2f}s for {n_q} queries")
    print(
        f"speedup at {n_q} queries: "
        f"{per_q_old * n_q / t_new_full:.0f}x"
    )


if __name__ == "__main__":
    main()
