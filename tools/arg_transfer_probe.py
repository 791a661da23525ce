"""Does a jitted call with N small numpy args pay N relay round trips?

The mapping-epoch kernels take 10-13 host numpy arrays per call
(create_new_points 13, fuse 12, local BA 10). If every argument is its own
upload sequence through the ~22-45 ms relay, argument COUNT — not payload —
dominates the epoch, and packing args into one buffer is the fix.

Measures, warm, on the current backend:
  a) f12(x1..x12)        — 12 separate (1024,) float32 numpy args
  b) f1(X)               — one (12,1024) numpy arg, same payload
  c) f12 with jnp args   — device-resident args (dispatch-only floor)
  d) device_put pytree   — one jax.device_put of the 12-array tuple, then f12

Usage: timeout 600 python tools/arg_transfer_probe.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_run")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 12


@jax.jit
def f12(*xs):
    return sum(x.sum() for x in xs)


@jax.jit
def f1(X):
    return X.sum()


def timeit(label, fn, reps=10):
    fn()  # warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1e3:8.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    xs = [rng.normal(size=1024).astype(np.float32) for _ in range(N)]
    X = np.stack(xs)
    xs_dev = [jnp.asarray(x) for x in xs]

    print(f"backend={jax.default_backend()}")
    timeit("12 numpy args", lambda: float(f12(*xs)))
    timeit("1 stacked numpy arg", lambda: float(f1(X)))
    timeit("12 device-resident args", lambda: float(f12(*xs_dev)))

    def via_device_put():
        d = jax.device_put(tuple(xs))
        return float(f12(*d))

    timeit("device_put(tuple) then call", via_device_put)

    # larger payload check: 12 x 256 KB vs 1 x 3 MB
    big = [rng.normal(size=65536).astype(np.float32) for _ in range(N)]
    B = np.stack(big)
    timeit("12 numpy args (256 KB each)", lambda: float(f12(*big)))
    timeit("1 stacked numpy arg (3 MB)", lambda: float(f1(B)))


if __name__ == "__main__":
    main()
