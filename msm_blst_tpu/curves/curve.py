"""Concrete G1/G2 curve instances with host-side constant handling.

Host <-> device point conversion helpers live here; device constants are plain
numpy (converted to device arrays lazily at trace time) so importing this
module never touches a JAX backend.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .. import constants as C
from ..fields.fp2 import FP2
from ..fields.limb import FP, ints_to_array, array_to_ints
from .ops import AffinePoint, CurveOps


def _mont(x: int) -> int:
    return x * (1 << 384) % C.P


class G1Curve(CurveOps):
    def __init__(self):
        super().__init__(FP, "G1")
        self.b_int = C.B_G1
        self.gen_int = (C.G1_X, C.G1_Y)

    def affine_from_ints(self, pts: Sequence) -> AffinePoint:
        """[(x, y) ints] -> Montgomery-domain device AffinePoint batch.

        Infinity is (0, 0); 0's Montgomery form is 0, so no special-casing.
        """
        import jax.numpy as jnp

        xs = ints_to_array([_mont(p[0]) for p in pts], FP.n_limbs)
        ys = ints_to_array([_mont(p[1]) for p in pts], FP.n_limbs)
        return AffinePoint(jnp.asarray(xs), jnp.asarray(ys))

    def affine_to_ints(self, p: AffinePoint):
        import jax

        x = array_to_ints(np.asarray(jax.device_get(FP._from_mont_jit(p.X))))
        y = array_to_ints(np.asarray(jax.device_get(FP._from_mont_jit(p.Y))))
        return list(zip(x, y))


class G2Curve(CurveOps):
    def __init__(self):
        super().__init__(FP2, "G2")
        self.b_int = C.B_G2
        self.gen_int = (C.G2_X, C.G2_Y)

    def affine_from_ints(self, pts: Sequence) -> AffinePoint:
        """[((x0,x1), (y0,y1)) ints] -> Montgomery device AffinePoint batch."""
        import jax.numpy as jnp

        def comp(vals):
            return jnp.asarray(ints_to_array([_mont(v) for v in vals], FP.n_limbs))

        X = jnp.stack([comp([p[0][0] for p in pts]), comp([p[0][1] for p in pts])])
        Y = jnp.stack([comp([p[1][0] for p in pts]), comp([p[1][1] for p in pts])])
        return AffinePoint(X, Y)

    def affine_to_ints(self, p: AffinePoint):
        import jax

        out = []
        comps = []
        for coord in (p.X, p.Y):
            c0 = array_to_ints(np.asarray(jax.device_get(FP._from_mont_jit(coord[0]))))
            c1 = array_to_ints(np.asarray(jax.device_get(FP._from_mont_jit(coord[1]))))
            comps.append(list(zip(c0, c1)))
        return list(zip(comps[0], comps[1]))


G1 = G1Curve()
G2 = G2Curve()
