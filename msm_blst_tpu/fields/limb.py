"""Limb-decomposed Montgomery field arithmetic on the TPU VPU.

Design (TPU-first, not a translation of blst's assembly):

* A field element batch is `uint32[L, *batch]` holding 16-bit limbs, little-endian
  by limb index. L = 24 for Fp (384 bits), 16 for Fr (256 bits). Batch-last keeps
  the batch on the 128-lane axis; the limb axis maps to sublanes.
* 16-bit limbs make every partial product fit a uint32 exactly
  ((2^16-1)^2 < 2^32), so multiplication needs no mulhi instruction — which the
  TPU VPU does not expose.
* Montgomery radix R = 2^(16·L) = 2^384 for Fp: identical to blst's 64-bit-limb
  radix, so Montgomery residues here are bit-identical to blst's
  (behavioral spec for the multiply: /root/reference/src/no_asm.h:29-102
  `mul_mont_n`; we use a CIOS loop with *deferred carries* instead of per-step
  carry chains — carries are resolved once at the end with a Kogge-Stone
  carry-lookahead, which is log-depth and branch-free, i.e. VPU-shaped).
* All values between ops are canonical: clean 16-bit limbs, value < modulus
  (conditional subtract after every add/mul — like blst).

Everything is branch-free; the only data-dependent constructs are `jnp.where`
selects, mirroring the constant-time style of /root/reference/src/vect.h:271-300
(`vec_select`) even though MSM inputs are public.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import P, R_ORDER

LIMB_BITS = 16
MASK = np.uint32((1 << LIMB_BITS) - 1)


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Python int -> uint32[n_limbs] of 16-bit limbs (little-endian)."""
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs))
    return np.array(
        [(x >> (LIMB_BITS * i)) & int(MASK) for i in range(n_limbs)], dtype=np.uint32
    )


def limbs_to_int(limbs) -> int:
    """uint32[n_limbs] (single element, no batch) -> Python int."""
    limbs = np.asarray(limbs, dtype=np.uint64).reshape(-1)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


def ints_to_array(xs, n_limbs: int) -> np.ndarray:
    """Iterable of ints -> uint32[n_limbs, len(xs)] batch."""
    xs = list(xs)
    out = np.zeros((n_limbs, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[:, j] = int_to_limbs(x, n_limbs)
    return out


def array_to_ints(a) -> list:
    """uint32[n_limbs, batch] -> list of Python ints."""
    a = np.asarray(a)
    assert a.ndim == 2
    return [limbs_to_int(a[:, j]) for j in range(a.shape[1])]


def _pad_rows(x, top: int, bottom: int):
    """Pad with zero rows along the limb axis (axis 0)."""
    if top == 0 and bottom == 0:
        return x
    pads = [(top, bottom)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)


def _shift_rows_up(x, d: int, fill=0):
    """Row j of output = row j-d of input (values move toward higher limbs)."""
    rolled = _pad_rows(x[:-d] if d > 0 else x, d, 0)
    if fill == 0:
        return rolled
    fill_block = jnp.full((d,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([fill_block, x[:-d]], axis=0)


def resolve_limbs(s):
    """Fully propagate carries: uint32[K, ...] with arbitrary 32-bit limb values
    (interpreted as sum of limb*2^(16 i)) -> clean 16-bit limbs uint32[K+1, ...].

    Requires total value < 2^(16 (K+1)). Branch-free: one local pass (carries can
    be up to 16 bits) followed by a Kogge-Stone carry-lookahead for the residual
    single-bit ripple.
    """
    c = s >> LIMB_BITS
    s = s & MASK
    # after this, limbs <= 0xffff + 0xffff = 0x1fffe: single-bit generate domain
    s = _pad_rows(s, 0, 1) + _shift_rows_up(_pad_rows(c, 0, 1), 1)
    g = (s >> LIMB_BITS).astype(jnp.uint32)          # generate: 0 or 1
    p = ((s & MASK) == MASK).astype(jnp.uint32)      # propagate
    K = s.shape[0]
    d = 1
    while d < K:
        g = g | (p & _shift_rows_up(g, d))
        p = p & _shift_rows_up(p, d, fill=1)
        d *= 2
    carry_in = _shift_rows_up(g, 1)
    return (s + carry_in) & MASK


class LimbField:
    """Branch-free batched arithmetic mod `modulus` in 16-bit limbs.

    Mirrors the capability of blst's field layer (/root/reference/src/vect.h,
    src/fields.h) and of the arbitrary-modulus C++ templates
    (/root/reference/src/blst_t.hpp) — any odd modulus up to 16*L bits works.
    """

    def __init__(self, modulus: int, n_limbs: int | None = None, name: str = "fp"):
        self.modulus = modulus
        bits = modulus.bit_length()
        self.n_limbs = n_limbs or -(-bits // LIMB_BITS)
        L = self.n_limbs
        self.name = name
        self.R = 1 << (LIMB_BITS * L)
        assert modulus % 2 == 1 and modulus < self.R
        # p0 = -modulus^-1 mod 2^16 (Montgomery factor for 16-bit radix)
        self.p0 = np.uint32((-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        self.P_np = int_to_limbs(modulus, L).reshape(L, 1)
        self.NOT_P_np = int_to_limbs(self.R - modulus, L).reshape(L, 1)
        self.RR_int = self.R * self.R % modulus
        self.RR_np = int_to_limbs(self.RR_int, L).reshape(L, 1)
        self.ONE_MONT_int = self.R % modulus
        self.ONE_MONT_np = int_to_limbs(self.ONE_MONT_int, L).reshape(L, 1)
        self.ONE_np = int_to_limbs(1, L).reshape(L, 1)
        # byte-Toeplitz Montgomery-reduction matrices (SOS multiply path)
        from . import pallas_mont as _pm

        for _n, _w in _pm.build_sos_consts(L, modulus).items():
            setattr(self, _n + "_np", _w)

    # ---- shape helpers ---------------------------------------------------
    def _rows(self, name: str):
        """(L, 1) constant rows; inside a Pallas kernel trace these come from
        the kernel's inputs (fields.pallas_mont.KERNEL_CONSTS) because Mosaic
        rejects captured host arrays."""
        from . import pallas_mont

        ik = pallas_mont.KERNEL_CONSTS.get((self.name, name))
        if ik is not None:
            return ik
        return jnp.asarray(getattr(self, name + "_np"))

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.n_limbs,) + tuple(batch_shape), dtype=jnp.uint32)

    def _const(self, c_np, batch_shape=()):
        v = jnp.asarray(c_np.reshape((self.n_limbs,) + (1,) * max(len(batch_shape), 1)))
        if batch_shape == ():
            return jnp.asarray(c_np.reshape(self.n_limbs))
        return jnp.broadcast_to(v, (self.n_limbs,) + tuple(batch_shape))

    def one_mont(self, batch_shape=()):
        """Montgomery-domain 1 (= R mod p)."""
        return self._const(self._rows("ONE_MONT"), batch_shape)

    def _expand_mask(self, mask, ref):
        """Broadcast a batch-shaped bool mask across the limb axis of `ref`."""
        extra = ref.ndim - mask.ndim
        return mask.reshape((1,) * extra + mask.shape)

    # ---- predicates ------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask ? a : b, mask shaped like the batch."""
        return jnp.where(self._expand_mask(mask, a), a, b)

    # ---- add / sub -------------------------------------------------------
    def _csub_p(self, a):
        """a (clean limbs, value < 2p) -> a mod p. Branch-free conditional subtract."""
        notp = self._rows("NOT_P").reshape((self.n_limbs,) + (1,) * (a.ndim - 1))
        v = resolve_limbs(a + notp)
        borrow_free = v[self.n_limbs] != 0  # a >= p
        return jnp.where(
            self._expand_mask(borrow_free, a), v[: self.n_limbs], a
        )

    def add(self, a, b):
        s = resolve_limbs(a + b)[: self.n_limbs]
        return self._csub_p(s)

    def double(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        # a - b via a + (2^(16L) - b) (two's complement), then +p if a < b.
        s = a + (MASK - b)
        s = jnp.concatenate([(s[0] + 1)[None], s[1:]])  # concat: Mosaic-safe
        r = resolve_limbs(s)
        a_ge_b = r[self.n_limbs] != 0
        r = r[: self.n_limbs]
        prows = self._rows("P").reshape((self.n_limbs,) + (1,) * (r.ndim - 1))
        r_plus_p = resolve_limbs(r + prows)[: self.n_limbs]
        return jnp.where(self._expand_mask(a_ge_b, r), r, r_plus_p)

    def neg(self, a):
        """-a mod p (0 -> 0)."""
        return self.sub(jnp.zeros_like(a), a)

    def cneg(self, a, flag):
        """flag ? -a : a."""
        return self.select(flag, self.neg(a), a)

    def mul3(self, a):
        return self.add(self.add(a, a), a)

    def mul8(self, a):
        return self.double(self.double(self.double(a)))

    # ---- Montgomery multiply --------------------------------------------
    @functools.cached_property
    def _pallas_mul(self):
        from .pallas_mont import make_mont_mul

        return make_mont_mul(self.n_limbs, int(self.p0), self.modulus)

    def _pallas_enabled(self) -> bool:
        import os

        from . import pallas_mont

        if os.environ.get("MSM_NO_PALLAS") or pallas_mont.IN_KERNEL:
            return False
        return jax.default_backend() == "tpu"

    def mul(self, a, b, unroll: int = 1):
        """Montgomery product a*b*R^-1 mod p. CIOS with deferred carries.

        On a TPU backend this dispatches to the fused Pallas kernel
        (fields/pallas_mont.py, ~1.8x the jnp path); the jnp path below is
        the portable spec implementation (and the CPU/test path).

        Loop invariant: t holds the running value as (L+1) uint32 limbs with
        value-preserving deferred carries; each iteration adds at most ~2^18
        per limb, so after L=24 iterations limbs stay < 2^23 << 2^32.

        The outer CIOS loop is a lax.fori_loop (serial dependence through m_i
        anyway); `unroll` trades compile time for scheduling freedom.
        """
        L = self.n_limbs
        if a.shape != b.shape:  # e.g. (L, 1) constants against (L, B) batches
            shp = jnp.broadcast_shapes(a.shape, b.shape)
            a = jnp.broadcast_to(a, shp)
            b = jnp.broadcast_to(b, shp)
        batch = a.shape[1:]
        if batch and self._pallas_enabled():
            nb = 1
            for d in batch:
                nb *= d
            if nb > 0:
                r = self._pallas_mul(a.reshape(L, nb), b.reshape(L, nb))
                return r.reshape((L,) + tuple(batch))
        t0 = jnp.zeros((L + 1,) + batch, dtype=jnp.uint32)
        P_c = self._rows("P").reshape((L,) + (1,) * max(len(batch), 1))
        zero_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)

        def round_(ai, t):
            prod = ai[None] * b  # (L, batch) full 32-bit products of 16-bit limbs
            t = t + _pad_rows(prod & MASK, 0, 1) + _shift_rows_up(
                _pad_rows(prod >> LIMB_BITS, 0, 1), 1
            )
            m = (t[0] * self.p0) & MASK
            q = m[None] * P_c
            t = t + _pad_rows(q & MASK, 0, 1) + _shift_rows_up(
                _pad_rows(q >> LIMB_BITS, 0, 1), 1
            )
            carry = t[0] >> LIMB_BITS
            # drop row 0, fold its carry into row 1 (concat: Mosaic-safe)
            return jnp.concatenate([(t[1] + carry)[None], t[2:], zero_row])

        from . import pallas_mont as _pm

        if _pm.IN_KERNEL:
            ws = [
                _pm.KERNEL_CONSTS.get((self.name, n))
                for n in _pm.SOS_CONST_NAMES
            ]
            if all(w is not None for w in ws) and _pm.mul_impl() == "sos":
                # SOS path: full product + MXU byte-Toeplitz reduction
                notp = self._rows("NOT_P")
                a2 = a.reshape(L, -1)
                b2 = b.reshape(L, -1)
                out = _pm._mont_mul_body_sos(a2, b2, L, *ws, notp)
                return out.reshape((L,) + tuple(batch))
            # inside a Pallas kernel: dynamic_slice of values doesn't lower —
            # unroll the CIOS rounds with static row indices
            t = t0
            for i in range(L):
                t = round_(a[i], t)
        else:
            t = jax.lax.fori_loop(
                0,
                L,
                lambda i, t: round_(
                    jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), t
                ),
                t0,
                unroll=unroll,
            )
        r = resolve_limbs(t)  # (L+2, batch); value < 2p so rows L, L+1 are zero
        return self._csub_p(r[:L])

    def sqr(self, a):
        return self.mul(a, a)

    def mul_many(self, pairs):
        """Compute many independent products in ONE multiply kernel call by
        stacking along the batch axis. All pairs must share a shape.

        This is the workhorse for point formulas: a staged formula issues 3-5
        wide multiplies instead of ~25 narrow ones — far cheaper to compile
        (fewer while-loops) and wider VPU lanes at runtime.
        """
        if len(pairs) == 1:
            return [self.mul(pairs[0][0], pairs[0][1])]
        from . import pallas_mont as _pm

        if _pm.IN_KERNEL and _pm.mul_impl() == "sos":
            # Mosaic cannot concatenate lane-axis operands whose sublane
            # offsets differ (SOS intermediates are row-sliced); per-pair
            # muls inside the kernel cost nothing extra — the body is
            # unrolled either way.
            return [self.mul(a, b) for a, b in pairs]
        a = jnp.concatenate([p[0] for p in pairs], axis=-1)
        b = jnp.concatenate([p[1] for p in pairs], axis=-1)
        r = self.mul(a, b)
        return jnp.split(r, len(pairs), axis=-1)

    # ---- Montgomery domain conversions ----------------------------------
    def to_mont(self, a):
        return self.mul(a, self._expand_const(self.RR_np, a))

    def from_mont(self, a):
        return self.mul(a, self._expand_const(self.ONE_np, a))

    def _expand_const(self, c_np, like):
        return jnp.asarray(c_np.reshape((self.n_limbs,) + (1,) * (like.ndim - 1)))

    # ---- exponentiation / inversion -------------------------------------
    def pow_int(self, a, e: int):
        """a^e (Montgomery domain in, Montgomery domain out), static exponent.

        Rolled into a lax.scan over the exponent bits so the compiled graph is
        one multiply body, not bit_length() of them.
        """
        nbits = max(e.bit_length(), 1)
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )
        one = self.one_mont(a.shape[1:])

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(bit != 0, self.mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, one, bits)
        return acc

    def inv(self, a):
        """a^-1 via Fermat (Montgomery in/out). inv(0) = 0 (matching the
        batch-inversion convention; callers guard infinity separately)."""
        return self.pow_int(a, self.modulus - 2)

    def is_square(self, a):
        """Batched Legendre symbol test: True where `a` is a QR mod p
        (device equivalent of blst's ct_is_square_mod_384,
        /root/reference/src/asm/ct_is_square_mod_384-x86_64.pl).
        Euler criterion a^((p-1)/2); zero counts as square."""
        e = self.pow_int(a, (self.modulus - 1) >> 1)
        return self.eq(e, self.one_mont(a.shape[1:])) | self.is_zero(a)

    def batch_inv(self, a):
        """Elementwise inverse over the last axis via Montgomery's trick:
        two product scans + one Fermat inversion (spec equivalent:
        /root/reference/src/multi_scalar.c:17-62 batch to-affine).

        Zeros pass through as zeros.
        """
        from ..utils import scans

        L, B = a.shape[0], a.shape[-1]
        zero_mask = self.is_zero(a)
        one = self.one_mont(a.shape[1:])
        safe = jnp.where(self._expand_mask(zero_mask, a), one, a)
        pref = scans.prefix_scan(self.mul, safe)
        suf = scans.suffix_scan(self.mul, safe)
        total = pref[..., -1:]
        inv_total = self.pow_int(total, self.modulus - 2)
        left = jnp.concatenate(
            [self.one_mont(a.shape[1:-1] + (1,)), pref[..., :-1]], axis=-1
        )
        right = jnp.concatenate(
            [suf[..., 1:], self.one_mont(a.shape[1:-1] + (1,))], axis=-1
        )
        inv = self.mul(self.mul(left, right), jnp.broadcast_to(inv_total, a.shape))
        return jnp.where(self._expand_mask(zero_mask, a), jnp.zeros_like(a), inv)

    # ---- host-side io ----------------------------------------------------
    @functools.cached_property
    def _to_mont_jit(self):
        return jax.jit(self.to_mont)

    @functools.cached_property
    def _from_mont_jit(self):
        return jax.jit(self.from_mont)

    def from_ints(self, xs, mont: bool = True):
        """Host ints -> device batch (optionally into Montgomery domain).

        Inputs are canonicalized mod p: every on-device value must be < p or
        the deferred-carry multiply's <2p bound no longer holds.
        """
        arr = jnp.asarray(ints_to_array([x % self.modulus for x in xs], self.n_limbs))
        return self._to_mont_jit(arr) if mont else arr

    def to_ints(self, a, mont: bool = True) -> list:
        x = self._from_mont_jit(a) if mont else a
        return array_to_ints(np.asarray(jax.device_get(x)))


FP = LimbField(P, name="fp")
FR = LimbField(R_ORDER, name="fr")
