"""Fully-fused Pallas kernels for the hot point operations.

Without fusion, one xyzz_dadd_affine step issues ~4 Montgomery-multiply
kernels with dozens of HBM-bound elementwise XLA ops between them — every
intermediate (24 x B x 4 B) round-trips HBM. These kernels trace the ENTIRE
branch-free point formula (curves/ops.py) inside one pallas_call, so the
~17 multiplies, all adds/selects, and the case analysis stay in VMEM.

The formula code is shared, not duplicated: inside the kernel body the
field's in-kernel flag (fields/pallas_mont.IN_KERNEL) routes F.mul to the
plain jnp CIOS path, which Mosaic lowers directly.

Ops: 'dadd_affine' (signed; the MSM hot op), 'dadd', 'double' — for G1 and
G2. Dispatch lives in CurveOps (curves/ops.py): TPU backend + 1/2-D lane
batches; everything else takes the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import pallas_mont
from .ops import AffinePoint, XyzzPoint

_BLOCK_B = 256


def _coord_shape(curve, block_b):
    L = curve.F.n_limbs
    return (2, L, block_b) if curve.name == "G2" else (L, block_b)


def _coord_spec(curve, block_b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if curve.name == "G2":
        return pl.BlockSpec((2, curve.F.n_limbs, block_b),
                            lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.BlockSpec((curve.F.n_limbs, block_b), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _kernel(curve_name: str, op: str, block_b: int = _BLOCK_B):
    """Build the jitted fused kernel for (curve, op). Cached per pair."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .curve import G1, G2

    curve = G1 if curve_name == "G1" else G2
    n1 = 4  # xyzz input coords
    if op == "dadd_affine":
        n2, has_sign = 2, True
    elif op == "dadd":
        n2, has_sign = 4, False
    elif op == "double":
        n2, has_sign = 0, False
    else:
        raise ValueError(op)

    n_data = n1 + n2 + int(has_sign)
    _CONST_NAMES = ("P", "NOT_P", "ONE_MONT") + pallas_mont.SOS_CONST_NAMES

    def kernel(*refs):
        consts = {
            ("fp", name): refs[n_data + k][:]
            for k, name in enumerate(_CONST_NAMES)
        }
        with pallas_mont.kernel_mode(consts=consts):
            vals = [r[:] for r in refs[:n_data]]
            p1 = XyzzPoint(*vals[:n1])
            outs = refs[n_data + len(_CONST_NAMES):]
            if op == "dadd_affine":
                p2 = AffinePoint(*vals[n1:n1 + 2])
                sign = vals[n1 + 2][0] != 0
                out = curve.xyzz_dadd_affine_body(p1, p2, subtract=sign,
                                                  cond_dbl=True)
            elif op == "dadd":
                p2 = XyzzPoint(*vals[n1:n1 + 4])
                out = curve.xyzz_dadd_body(p1, p2, cond_dbl=True)
            else:
                out = curve.xyzz_double(p1)
            for r, c in zip(outs, out):
                r[:] = c

    cspec = _coord_spec(curve, block_b)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sign_spec = pl.BlockSpec((1, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    cshape = _coord_shape(curve, block_b)

    fp = curve.F.base if curve.name == "G2" else curve.F
    L = fp.n_limbs

    def _const_np(name):
        arr = np.ascontiguousarray(getattr(fp, name + "_np"))
        if arr.dtype == np.float32:  # SOS byte-Toeplitz matrices -> bf16
            import ml_dtypes

            return arr.astype(ml_dtypes.bfloat16)  # numpy: never a tracer
        return arr

    const_arrays = tuple(_const_np(name) for name in _CONST_NAMES)
    const_specs = [
        pl.BlockSpec(tuple(c.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in const_arrays
    ]

    @jax.jit
    def run(*arrays):
        B = arrays[0].shape[-1]
        Bp = -(-B // block_b) * block_b
        if Bp != B:
            arrays = tuple(
                jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
                for a in arrays
            )
        in_specs = (
            [cspec] * (n1 + n2)
            + ([sign_spec] if has_sign else [])
            + const_specs
        )
        out_shape = [
            jax.ShapeDtypeStruct(cshape[:-1] + (Bp,), jnp.uint32)
            for _ in range(4)
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=in_specs,
            out_specs=[_coord_spec(curve, block_b)] * 4,
            out_shape=out_shape,
        )(*arrays, *(jnp.asarray(c) for c in const_arrays))
        if Bp != B:
            outs = tuple(o[..., :B] for o in outs)
        return XyzzPoint(*outs)

    return run


def fused_available(curve) -> bool:
    import os

    if os.environ.get("MSM_NO_PALLAS") or os.environ.get("MSM_NO_FUSED_POINT"):
        return False
    if pallas_mont.IN_KERNEL:
        return False
    return jax.default_backend() == "tpu"


def _batch_of(curve, coord):
    return coord.shape[(2 if curve.name == "G2" else 1):]


def dispatch(curve, op: str, p1: XyzzPoint, p2=None, subtract=None):
    """Run the fused kernel if eligible; returns None to fall back."""
    if not fused_available(curve):
        return None
    batch = _batch_of(curve, p1.X)
    if len(batch) == 0 or int(np.prod(batch)) == 0:
        return None
    lead = 2 if curve.name == "G2" else 1

    def flat(c):
        return c.reshape(c.shape[:lead] + (-1,))

    arrays = [flat(c) for c in p1]
    if op == "dadd_affine":
        arrays += [flat(c) for c in p2]
        B = arrays[0].shape[-1]
        if subtract is None:
            s = jnp.zeros((1, B), jnp.int32)
        else:
            s = jnp.broadcast_to(subtract, batch).reshape(1, B).astype(jnp.int32)
        arrays.append(s)
    elif op == "dadd":
        arrays += [flat(c) for c in p2]
    out = _kernel(curve.name, op)(*arrays)
    if len(batch) > 1:
        out = XyzzPoint(
            *(c.reshape(c.shape[:lead] + tuple(batch)) for c in out)
        )
    return out
