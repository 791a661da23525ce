"""Profiling: JAX device traces + XLA cost analysis (SURVEY.md §5).

The reference has no tracing at all; the north star requires knowing kernel
speed-of-light, which cost_analysis provides per compiled executable.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args) -> dict:
    """FLOPs / bytes estimates of a jitted function from XLA.

    Returns {} when the backend does not expose cost analysis.
    """
    try:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return dict(ca) if ca else {}
    except Exception:
        return {}


def speed_of_light_report(fn, *args, peak_flops: float = 197e12, peak_bw: float = 819e9):
    """Roofline estimate for one jitted function on TPU v5e defaults
    (197 TFLOP/s bf16, ~819 GB/s HBM). Returns dict with flops, bytes, and
    the compute/memory-bound lower-bound runtime."""
    ca = cost_analysis(fn, *args)
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    t_compute = flops / peak_flops
    t_memory = bytes_accessed / peak_bw
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "t_lower_bound_s": max(t_compute, t_memory),
    }
