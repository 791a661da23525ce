"""Can two host threads overlap device programs on the relay-fronted TPU?

The async-mapping design (VERDICT r4 next #1, option (a)) only pays if a
mapping thread's upload-execute-read sequences overlap with the tracking
thread's, instead of serializing end-to-end. This measures exactly that:
N identical small programs run (a) sequentially from one thread and
(b) concurrently from two threads, each timed wall-clock.

Also checks correctness: results from both threads must match the
single-thread values bit-for-bit (jax dispatch is documented thread-safe;
the experimental axon backend is the thing under test).

Usage: timeout 600 python tools/thread_overlap_probe.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_run")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@jax.jit
def work_a(x):
    return (x @ x).sum()


@jax.jit
def work_b(x):
    return (x * 2.0 + 1.0).sum()


def run_n(fn, x, n):
    out = None
    for _ in range(n):
        out = float(fn(x))
    return out


def main():
    n = 8
    xa = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)).astype(np.float32))
    xb = jnp.asarray(np.random.default_rng(1).normal(size=(1024, 1024)).astype(np.float32))
    # warm both programs
    ref_a = run_n(work_a, xa, 1)
    ref_b = run_n(work_b, xb, 1)

    t0 = time.perf_counter()
    run_n(work_a, xa, n)
    run_n(work_b, xb, n)
    seq_s = time.perf_counter() - t0

    results = {}

    def worker(name, fn, x):
        results[name] = run_n(fn, x, n)

    t0 = time.perf_counter()
    ta = threading.Thread(target=worker, args=("a", work_a, xa))
    tb = threading.Thread(target=worker, args=("b", work_b, xb))
    ta.start(); tb.start(); ta.join(); tb.join()
    conc_s = time.perf_counter() - t0

    ok = results["a"] == ref_a and results["b"] == ref_b
    print(
        f"backend={jax.default_backend()} n={n} per stream\n"
        f"sequential: {seq_s*1e3:8.1f} ms total ({seq_s/(2*n)*1e3:6.1f} ms/program)\n"
        f"2 threads:  {conc_s*1e3:8.1f} ms total (overlap factor {seq_s/conc_s:.2f}x)\n"
        f"correct={ok}"
    )


if __name__ == "__main__":
    main()
