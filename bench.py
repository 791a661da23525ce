"""Benchmark: tracked frames/s of the flagship per-frame tracking step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The step is the REAL fused steady-state tracking step of the system
(Tracking._build_fused_steady, SURVEY.md §3.2/3.4): ORB extraction
(pyramid + FAST + select + fused angle/blur/BRIEF patch kernel) ->
motion-model projection match (in-graph radius retry) -> pose-only BA
(4x10 chi2-gated LM) -> local-map projection match (landmark invariants)
-> second pose-only BA -> velocity update; one jitted program at 640x480
with a 512-feature budget, 1024 live landmarks, 4096-slot local map.

Baseline: the reference publishes no numbers and cannot run (BASELINE.md);
per BASELINE.json config 1 the baseline is our own CPU-runnable
implementation of the same pipeline. The CPU baseline is MEASURED IN-RUN
(same container, same chained-step methodology, jnp kernel path) rather
than hard-coded; if the CPU backend is unavailable the last recorded
measurement (2.47 frames/s) is used and labeled as such.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CPU_BASELINE_FPS_FALLBACK = 2.47  # last recorded in-container measurement
REPS = 10  # tracking steps chained inside one device program


def _chained_step(fn, args):
    """Chain REPS tracking steps inside ONE program (pose and velocity feed
    forward between steps, exactly like the real system) so per-call dispatch
    overhead — large through this container's shared TPU relay — amortizes
    away and the number reflects on-device time. Each iteration reads a
    DIFFERENT image (indexed from a stacked batch inside the loop) so no
    stage is loop-invariant: XLA's LICM cannot hoist the ORB extraction out
    of the timed loop."""
    import jax
    from jax import lax

    (image, packed_ids, velocity, last_pose, *tables) = args

    def chained(imgs, T0, V0):
        def body(i, carry):
            T, V = carry
            img = lax.dynamic_index_in_dim(imgs, i, axis=0, keepdims=False)
            _, Tcw, _, vel, _, _, _ = fn(
                img, packed_ids, V, T, *tables
            )
            return Tcw, vel

        T, V = lax.fori_loop(0, REPS, body, (T0, V0))
        return T, V

    return jax.jit(chained), last_pose, velocity


def _measure(step, batches, last_pose, velocity, n_calls: int, trials: int) -> float:
    import jax
    import jax.numpy as jnp

    float(jnp.sum(step(batches[0], last_pose, velocity)[0]))  # compile + run
    best_fps = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [
            step(batches[i % len(batches)], last_pose, velocity)
            for i in range(n_calls)
        ]
        # Host-read the last result: on this backend block_until_ready alone
        # may not force execution (BENCH_NOTES.md); a scalar read does, and
        # in-order device queues mean it forces all prior calls too.
        jax.block_until_ready(outs)
        _ = np.asarray(outs[-1][0]).sum()
        dt = time.perf_counter() - t0
        best_fps = max(best_fps, n_calls * REPS / dt)
    return best_fps


def _bench_on_default_device(use_pallas, n_calls, trials):
    import jax.numpy as jnp

    from __graft_entry__ import _build_bench_state

    fn, args, images = _build_bench_state(n_images=REPS, use_pallas=use_pallas)
    step, last_pose, velocity = _chained_step(fn, args)
    rng = np.random.default_rng(1)
    # real consecutive rendered frames (the pose/velocity feedback genuinely
    # tracks), lightly noised per trial batch
    batches = [
        jnp.asarray(images + rng.uniform(0, 1, images.shape).astype(np.float32))
        for _ in range(4)
    ]
    return _measure(step, batches, last_pose, velocity, n_calls, trials)


def main():
    # make the CPU backend available alongside the TPU for the in-run
    # baseline (must happen before backends initialize)
    plats = os.environ.get("JAX_PLATFORMS", "")
    import jax

    if plats and "cpu" not in plats:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_run")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    fps = _bench_on_default_device(use_pallas=None, n_calls=8, trials=5)

    baseline_fps = CPU_BASELINE_FPS_FALLBACK
    baseline_source = "recorded"
    if os.environ.get("BENCH_SKIP_CPU_BASELINE", "") != "1":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                # 4 trials x 3 calls: the r1->r2 headline ratio swung ~12%
                # purely from run-to-run jitter at trials=2 on this shared
                # container (VERDICT r2 weak #9); more best-of sampling
                # stabilizes the denominator
                baseline_fps = _bench_on_default_device(
                    use_pallas=False, n_calls=3, trials=4
                )
            baseline_source = "measured_in_run"
        except Exception:
            baseline_source = "recorded_fallback"

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
                "baseline_fps": round(baseline_fps, 3),
                "baseline_source": baseline_source,
            }
        )
    )


if __name__ == "__main__":
    main()
