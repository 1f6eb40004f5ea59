"""Where does the bmx staged-driver wall clock go? (round 4)

One process, one corpus build: runs the clustered bench_bmx workload
through run_stream_staged with timing wrappers around the three driver
callbacks, for several (d1, d2) depths. Separates THREAD time (host
pruning inside dispatch; keep2/job_table inside advance) from READ WAITS
(the np.asarray drains inside advance/finalize), the two quantities the
pipeline can and cannot hide respectively.

Run on the chip: python scripts/bmx_stage_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench_bmx import (TOPK, T_BUDGET, analytic_meta, gen_device_csr,
                       make_cfg, make_tiles)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    from scaling_retriever_tpu.ops.blockmax import BlockMaxSegsortEngine
    from scaling_retriever_tpu.utils.utils import (force_materialized,
                                                   staged_pipeline)

    log(f"devices: {jax.devices()}")
    cfg = make_cfg()
    t0 = time.perf_counter()
    rows, bits = gen_device_csr(cfg)
    force_materialized(rows, bits)
    log(f"CSR on device in {time.perf_counter()-t0:.0f}s")
    meta = analytic_meta(cfg)
    csr = (rows, bits, cfg["offsets"], cfg["N"])
    tiles = make_tiles(cfg, np.random.default_rng(0), 12)

    eng = BlockMaxSegsortEngine(None, topk=TOPK, query_terms_budget=T_BUDGET,
                                cover=4.0, meta=meta, device_csr=csr,
                                sync_upload=False)

    def run(d1, d2, label):
        acc = {"dispatch": 0.0, "advance": 0.0, "drain": 0.0}
        out = []

        def disp(t):
            t0 = time.perf_counter()
            p = eng.retrieve_tile_async(None, TOPK, sparsified=(t[0], t[1]))
            acc["dispatch"] += time.perf_counter() - t0
            return p

        def adv(p):
            t0 = time.perf_counter()
            r = eng.continue_async(p)
            acc["advance"] += time.perf_counter() - t0
            return r

        def drn(p):
            t0 = time.perf_counter()
            out.append(eng.finalize(p))
            acc["drain"] += time.perf_counter() - t0

        host0 = dict(eng.host_ms)
        t0 = time.perf_counter()
        staged_pipeline(tiles, disp, adv, drn, d1=d1, d2=d2)
        dt = time.perf_counter() - t0
        host = {k: eng.host_ms[k] - host0.get(k, 0.0)
                for k in eng.host_ms}
        n = len(tiles)
        log(f"{label} d1={d1} d2={d2}: {dt/n*1e3:7.1f} ms/tile "
            f"({64*n/dt:6.1f} QPS) | thread ms/tile: "
            f"dispatch {acc['dispatch']/n*1e3:5.1f} "
            f"advance {acc['advance']/n*1e3:5.1f} "
            f"drain {acc['drain']/n*1e3:5.1f} | host prune ms/tile: "
            f"{ {k: round(v/n, 1) for k, v in host.items()} }")
        return out

    # warm: compiles + executable warm-up
    run(2, 2, "warm1")
    run(2, 2, "warm2")
    for d1, d2 in ((2, 2), (3, 3), (4, 2), (2, 4), (4, 4)):
        run(d1, d2, "timed")
    # repeat the default to bracket drift
    run(2, 2, "timed")


if __name__ == "__main__":
    main()
