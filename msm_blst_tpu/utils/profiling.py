"""Profiling / observability for the MSM engine.

The reference's observability is wall-clock spans printed by the driver
(/root/reference/main_p1.cpp:459-608). Here (SURVEY.md §5) we add:

  * `span(name)` — wall-clock context manager with tunnel-safe forcing
  * `trace(path)` — jax.profiler trace wrapper (view in TensorBoard/Perfetto)
  * op-count models per algorithm (the roofline anchors of BASELINE.md) and
    `report(...)` turning a measured wall-clock into Fp-muls/s + % of the
    device's measured multiply throughput.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np


def force(tree):
    """Completion barrier that is reliable over the axon tunnel
    (block_until_ready can return early there)."""
    import jax

    return jax.tree_util.tree_map(lambda c: np.asarray(jax.device_get(c)), tree)


@contextlib.contextmanager
def span(name: str, results: Optional[dict] = None, verbose: bool = True):
    """Wall-clock span. Use `force()` on device outputs inside the span."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if results is not None:
        results[name] = dt
    if verbose:
        print(f"[span] {name}: {dt*1e3:.1f} ms")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (TensorBoard / Perfetto viewable)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# op-count models (from the reference's tile implementations; BASELINE.md)
# ---------------------------------------------------------------------------

# Fp-muls per curve op (M+S counted as muls; G2 ~3x via Karatsuba)
DADD_AFFINE = 10  # 8M + 2S
DADD = 14         # 12M + 2S
DOUBLE = 7        # 2M + 5S (Jacobian)


@dataclass
class OpCounts:
    accum_adds: int      # dadd_affine count (the n*h stream)
    integ_adds: int      # dadd count in integration
    doublings: int

    @property
    def fp_muls(self) -> int:
        return (self.accum_adds * DADD_AFFINE + self.integ_adds * DADD
                + self.doublings * DOUBLE)


def ches_op_counts(n: int, cfg) -> OpCounts:
    """CHES query model: n*h accumulates + (2 B_SIZE + 2 d_max) integration
    adds, zero doublings (multi_scalar.c:421-463, :301-321)."""
    return OpCounts(n * cfg.h, 2 * cfg.b_size + 2 * cfg.d_max, 0)


def bgmw_op_counts(n: int, cfg) -> OpCounts:
    return OpCounts(n * cfg.h_bgmw, 2 * ((cfg.q_bgmw >> 1) + 1), 0)


def stock_op_counts(n: int, window: int) -> OpCounts:
    h = -(-255 // window)
    return OpCounts(n * h, h * (1 << (window - 1)) * 2, 255)


def report(metric: str, wall_s: float, ops: OpCounts,
           device_muls_per_s: Optional[float] = None, g2: bool = False) -> dict:
    """One observability record: wall-clock, modeled Fp-muls, achieved rate,
    and (if the device's measured multiply throughput is supplied) the
    fraction of multiply-roofline achieved."""
    muls = ops.fp_muls * (3 if g2 else 1)
    rec = {
        "metric": metric,
        "wall_ms": round(wall_s * 1e3, 2),
        "model_fp_muls": muls,
        "achieved_fp_muls_per_s": float(f"{muls / wall_s:.4g}"),
    }
    if device_muls_per_s:
        rec["fraction_of_mul_roofline"] = round(
            muls / wall_s / device_muls_per_s, 3
        )
    return rec


def print_report(*args, **kwargs) -> dict:
    rec = report(*args, **kwargs)
    print(json.dumps(rec))
    return rec
