"""Precomputation: fixed-point lists and the q^j multiple tables.

TPU-native replacements for the reference's init phase:

* The reference builds q^j·P_i with a naive per-point double-and-add
  (main_p1.cpp:72-91, :155-177) — serial, O(n·h·c) point ops. Here q = 2^c, so
  q^j·P_i is a *batched doubling chain*: c·h vectorized doublings over all n
  points total, plus one batched to-affine at the end.
* The fixed point list P_i = 2^(i+1)·G (main_p1.cpp:52-66) is an inherently
  serial doubling chain; instead we compute e_i = 2^(i+1) mod r on the host and
  evaluate P_i = e_i·G with a fixed-base window table — depth 32, width n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_ORDER
from ..curves.ops import AffinePoint, CurveOps, XyzzPoint
from ..refimpl import G1_REF, G2_REF
from . import params as P
from .engine import MsmPlan


_REF_FOR = {"G1": G1_REF, "G2": G2_REF}


def _ref_affine_to_ints(curve: CurveOps, pt):
    if curve.name == "G1":
        return (pt[0].v, pt[1].v)
    return ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))


@functools.lru_cache(maxsize=4)
def _fixed_base_table_host(curve_name: str, w: int = 8):
    """T[j][d] = d * 2^(w j) * G as int tuples; built once with the oracle."""
    ref = _REF_FOR[curve_name]
    windows = -(-256 // w)
    base = ref.generator_jac()
    table = []
    for j in range(windows):
        row = [ref.affine_inf()]
        acc = ref.jac_inf()
        for d in range(1, 1 << w):
            acc = ref.jac_add(acc, base)
            row.append(ref.to_affine(acc))
        table.append(row)
        for _ in range(w):
            base = ref.jac_double(base)
    return table


def fixed_base_mult(curve: CurveOps, scalars_ints, w: int = 8) -> AffinePoint:
    """[e_0..e_{n-1}] ints -> affine batch of e_i * G via windowed fixed-base."""
    host_table = _fixed_base_table_host(curve.name, w)
    windows = len(host_table)
    # stacked device table: leading axis = window
    tdev = AffinePoint(
        *(
            jnp.stack(cs)
            for cs in zip(
                *(
                    curve.affine_from_ints(
                        [_ref_affine_to_ints(curve, p) for p in row]
                    )
                    for row in host_table
                )
            )
        )
    )
    digits = np.zeros((windows, len(scalars_ints)), dtype=np.int32)
    for i, e in enumerate(scalars_ints):
        e %= R_ORDER
        for j in range(windows):
            digits[j, i] = (e >> (w * j)) & ((1 << w) - 1)

    @jax.jit
    def run(digits, tdev):
        def body(acc, xs):
            digit_row, trow = xs
            pts = curve.take(trow, digit_row)
            return curve.xyzz_dadd_affine(acc, pts), None

        acc0 = curve.xyzz_inf((digits.shape[1],))
        acc, _ = jax.lax.scan(body, acc0, (digits, tdev))
        return curve.xyzz_to_affine(acc)

    return run(jnp.asarray(digits), tdev)


def fixed_point_list(curve: CurveOps, n: int) -> AffinePoint:
    """P_i = 2^(i+1) * G, i = 0..n-1 — same points as main_p1.cpp:52-66."""
    es = [pow(2, i + 1, R_ORDER) for i in range(n)]
    return fixed_base_mult(curve, es)


def _doubling_chain_tables(curve: CurveOps, points: AffinePoint, c: int, h: int,
                           with_m23: bool) -> XyzzPoint:
    """Core builder: for j in 0..h-1 emit (q^j P_i [, 2 q^j P_i, 3 q^j P_i]),
    advancing by c batched doublings per window (a lax.scan of length h whose
    body is c vectorized doublings). Returns XyzzPoint with leading axes
    (h, n_m) stacked over the batch."""

    def body(cur, _):
        if with_m23:
            d2 = curve.xyzz_double(cur)
            d3 = curve.xyzz_dadd(d2, cur)
            out = XyzzPoint(*(jnp.stack(cs) for cs in zip(cur, d2, d3)))
        else:
            out = XyzzPoint(*(c_[None] for c_ in cur))
        nxt = cur
        for _ in range(c):
            nxt = curve.xyzz_double(nxt)
        return nxt, out

    cur0 = curve.xyzz_from_affine(points)
    _, slots = jax.lax.scan(body, cur0, None, length=h)
    return slots  # coords shaped (h, n_m, ..., n)


def _slots_to_affine_table(curve: CurveOps, slots: XyzzPoint, n: int) -> AffinePoint:
    """Flatten stacked (h, n_m, ..., n) slots into the reference's table layout
    (slot = n_m*(i*h+j)+(m-1), i.e. i-major then window then multiple —
    main_p1.cpp:100,163) and convert to affine with one batched inversion."""
    h, n_m = slots.X.shape[0], slots.X.shape[1]
    # (h, n_m, ..., n) -> (..., h, n_m, n) -> (..., h*n_m*n) with j,m,i order
    flat = XyzzPoint(
        *(
            jnp.moveaxis(c_, (0, 1), (-3, -2)).reshape(c_.shape[2:-1] + (h * n_m * n,))
            for c_ in slots
        )
    )
    aff = curve.xyzz_to_affine(flat)
    # dest slot s = n_m*(i*h+j)+(m-1) <- src = (j*n_m + m-1)*n + i
    i_ = np.arange(n)[:, None, None]
    j_ = np.arange(h)[None, :, None]
    m_ = np.arange(n_m)[None, None, :]
    src = ((j_ * n_m + m_) * n + i_).reshape(-1).astype(np.int32)
    return curve.take(aff, jnp.asarray(src))


def build_ches_table(curve: CurveOps, points: AffinePoint, cfg: P.MsmConfig) -> AffinePoint:
    """PRECOMPUTATION_POINTS_LIST_3nh (spec: main_p1.cpp:128-178)."""
    n = points.X.shape[-1]

    @jax.jit
    def run(points):
        slots = _doubling_chain_tables(curve, points, cfg.c, cfg.h, with_m23=True)
        return _slots_to_affine_table(curve, slots, n)

    return run(points)


def build_bgmw_table(curve: CurveOps, points: AffinePoint, cfg: P.MsmConfig) -> AffinePoint:
    """PRECOMPUTATION_POINTS_LIST_BGMW95 (spec: main_p1.cpp:94-122)."""
    n = points.X.shape[-1]

    @jax.jit
    def run(points):
        slots = _doubling_chain_tables(curve, points, cfg.c_bgmw, cfg.h_bgmw,
                                       with_m23=False)
        return _slots_to_affine_table(curve, slots, n)

    return run(points)


def _rows_of_affine(curve: CurveOps, aff: AffinePoint,
                    pack: bool = False) -> jnp.ndarray:
    """(lead, L, B) affine batch -> (B, 2D) packed rows (X||Y); pack=True
    additionally packs limb pairs into uint32 words ((B, D) rows, half the
    bytes — the PackedRows32 layout)."""
    from ..curves.ops import pack_u16_rows

    def r(c_):
        cols = jnp.moveaxis(c_, -1, 0).reshape(c_.shape[-1], -1)
        return pack_u16_rows(cols) if pack else cols

    return jnp.concatenate([r(aff.X), r(aff.Y)], axis=1)


def pack_tables_default() -> bool:
    """Limb-packed (PackedRows32) tables: half the HBM + gather bytes.
    Default on; MSM_PACK_TABLES=0 restores the round-3 unpacked layout."""
    import os

    return os.environ.get("MSM_PACK_TABLES", "1") != "0"


def plan_rows(curve: CurveOps, aff: AffinePoint):
    """Affine batch -> the plan's current row storage format."""
    return curve.to_rows32(aff) if pack_tables_default() else curve.to_rows(aff)


def build_ches_table_rows_streamed(curve: CurveOps, points: AffinePoint,
                                   cfg: P.MsmConfig, pack: bool | None = None):
    """J-major CHES table (public entry): scan-stacked builder, or the
    window-at-a-time bigmem builder when the table approaches HBM capacity
    (the scan's stacked intermediate pads h to a sublane multiple)."""
    n = points.X.shape[-1]
    if pack is None:
        pack = pack_tables_default()
    if _table_bytes(curve, 3 * cfg.h * n, pack) >= _BIGMEM_BYTES:
        return build_ches_table_rows_bigmem(curve, points, cfg, pack=pack)
    return _build_ches_rows_scan(curve, points, cfg, pack=pack)


def _build_ches_rows_scan(curve: CurveOps, points: AffinePoint,
                          cfg: P.MsmConfig, pack: bool | None = None):
    """Big-n CHES table builder: J-MAJOR row layout, windows converted to
    affine one at a time.

    The default builder stacks the whole 3nh table in XYZZ (4 coords) before
    one batch inversion plus a full-table permutation — ~4x the final table
    in transient HBM, which is fatal at n >= 2^19 (table alone is 3.9 GB).
    Here each scan step converts its window to affine rows immediately
    (per-window batch inversion) and windows land CONTIGUOUSLY:
    row = j*3n + 3i + (m-1) — so the stacked scan output IS the table, with
    zero scatter and zero permutation. The engine consumes the layout via
    MsmPlan.layout == "j" (slot = 3*(j*n + i) + m-1).

    With pack (default) rows are limb-packed in the scan body, so the scan
    OUTPUT — the whole table — is already half-size in HBM.
    """
    from ..curves.ops import PackedRows, PackedRows32

    n = points.X.shape[-1]
    c, h = cfg.c, cfg.h
    if pack is None:
        pack = pack_tables_default()

    @jax.jit
    def run(points):
        def body(cur, _):
            d2 = curve.xyzz_double(cur)
            d3 = curve.xyzz_dadd(d2, cur)
            grp = XyzzPoint(
                *(
                    jnp.stack(cs, axis=-1).reshape(cs[0].shape[:-1] + (3 * n,))
                    for cs in zip(cur, d2, d3)
                )
            )  # interleaved (P, 2P, 3P) per point: lane 3i+m-1
            aff = curve.xyzz_to_affine(grp)
            rows = _rows_of_affine(curve, aff, pack=pack)  # (3n, 2D | D)
            nxt = cur
            for _ in range(c):
                nxt = curve.xyzz_double(nxt)
            return nxt, rows

        cur0 = curve.xyzz_from_affine(points)
        _, rows = jax.lax.scan(body, cur0, None, length=h)  # (h, 3n, ·)
        return rows.reshape(h * 3 * n, -1)

    return (PackedRows32 if pack else PackedRows)(run(points))


def build_bgmw_table_rows_streamed(curve: CurveOps, points: AffinePoint,
                                   cfg: P.MsmConfig, pack: bool | None = None):
    """J-major streamed BGMW95 table: row = j*n + i. Near-HBM-capacity
    tables (G2 2^21 nh = 4.8 GB) take the window-at-a-time builder — the
    scan's stacked (h, n, D) output plus per-window conversion transients
    OOM one chip otherwise."""
    from ..curves.ops import PackedRows, PackedRows32

    n = points.X.shape[-1]
    c, h = cfg.c_bgmw, cfg.h_bgmw
    if pack is None:
        pack = pack_tables_default()
    if _table_bytes(curve, h * n, pack) >= _BIGMEM_BYTES:
        return build_bgmw_table_rows_bigmem(curve, points, cfg, pack=pack)

    @jax.jit
    def run(points):
        def body(cur, _):
            rows = _rows_of_affine(curve, curve.xyzz_to_affine(cur), pack=pack)
            nxt = cur
            for _ in range(c):
                nxt = curve.xyzz_double(nxt)
            return nxt, rows

        cur0 = curve.xyzz_from_affine(points)
        _, rows = jax.lax.scan(body, cur0, None, length=h)
        return rows.reshape(h * n, -1)

    return (PackedRows32 if pack else PackedRows)(run(points))


def build_bgmw_table_rows_bigmem(curve: CurveOps, points: AffinePoint,
                                 cfg: P.MsmConfig, pack: bool | None = None):
    """Window-at-a-time j-major BGMW table builder (bigmem twin of
    build_ches_table_rows_bigmem, without the m=2,3 group): one jitted
    donated window step run h times from the host into a preallocated flat
    row buffer — peak HBM = table + one window's conversion transients."""
    import functools
    import os

    from ..curves.ops import PackedRows, PackedRows32

    n = points.X.shape[-1]
    c, h = cfg.c_bgmw, cfg.h_bgmw
    if pack is None:
        pack = pack_tables_default()

    lanes_target = int(os.environ.get(
        "MSM_BUILD_LANES",
        str((1 << 18) if curve.name == "G2" else (1 << 19))))
    Pn = max(1, -(-n // lanes_target))
    n_p = n // Pn
    assert n_p * Pn == n, (n, Pn)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window_step(cur):
        rows = _rows_of_affine(curve, curve.xyzz_to_affine(cur), pack=pack)
        nxt = cur
        for _ in range(c):
            nxt = curve.xyzz_double(nxt)
        return nxt, rows

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write(buf, rows, start):
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    lift = jax.jit(curve.xyzz_from_affine)
    buf = None
    for p in range(Pn):
        pts_p = type(points)(*(c_[..., p * n_p:(p + 1) * n_p]
                               for c_ in points))
        cur = lift(pts_p)
        for j in range(h):
            cur, rows = window_step(cur)
            if buf is None:
                buf = jnp.zeros((h * n, rows.shape[1]), jnp.uint32)
            buf = write(buf, rows, jnp.int32(j * n + p * n_p))
        del cur
    jax.block_until_ready(buf)
    return (PackedRows32 if pack else PackedRows)(buf)


def build_ches_table_rows_bigmem(curve: CurveOps, points: AffinePoint,
                                 cfg: P.MsmConfig, pack: bool | None = None):
    """Window-at-a-time CHES table builder for tables near HBM capacity.

    The lax.scan builder stacks all h windows into one (h, 3n, D) output
    whose XLA layout pads h to a sublane multiple (observed +1.7 GB on the
    7.3 GB n=2^21 table -> compile-time OOM, artifacts/bench_n21_ches_r4).
    Here ONE jitted window step (donated doubling-chain state) runs h times
    from the host, each window written into a preallocated flat (h*3n, D)
    row buffer via donated dynamic_update_slice — peak HBM = table + one
    window's conversion transients. Same j-major rows, bit-identical."""
    import functools

    from ..curves.ops import PackedRows, PackedRows32

    n = points.X.shape[-1]
    c, h = cfg.c, cfg.h
    if pack is None:
        pack = pack_tables_default()

    # split over POINTS: a window step on n_p lanes needs ~n_p-proportional
    # transients (the batch_inv inside to-affine materializes ~5x its input,
    # measured 9.4 GB temp for one full 2^21 window next to the 7.25 GB
    # buffer). n_p = 512k lanes (G1) bounds the step around ~2.4 GB; the
    # same compiled step runs P*h times.
    import os

    lanes_target = int(os.environ.get(
        "MSM_BUILD_LANES",
        str((1 << 18) if curve.name == "G2" else (1 << 19))))
    P = max(1, -(-n // lanes_target))
    n_p = n // P
    assert n_p * P == n, (n, P)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window_step(cur):
        d2 = curve.xyzz_double(cur)
        d3 = curve.xyzz_dadd(d2, cur)
        grp = XyzzPoint(
            *(
                jnp.stack(cs, axis=-1).reshape(cs[0].shape[:-1] + (3 * n_p,))
                for cs in zip(cur, d2, d3)
            )
        )
        rows = _rows_of_affine(curve, curve.xyzz_to_affine(grp), pack=pack)
        nxt = cur
        for _ in range(c):
            nxt = curve.xyzz_double(nxt)
        return nxt, rows

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write(buf, rows, start):
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    lift = jax.jit(curve.xyzz_from_affine)
    D = None
    buf = None
    for p in range(P):
        pts_p = type(points)(*(c_[..., p * n_p:(p + 1) * n_p]
                               for c_ in points))
        cur = lift(pts_p)
        for j in range(h):
            cur, rows = window_step(cur)
            if buf is None:
                D = rows.shape[1]
                buf = jnp.zeros((h * 3 * n, D), jnp.uint32)
            # rows of point chunk p, window j: j*3n + p*3n_p .. + 3n_p
            buf = write(buf, rows, jnp.int32(j * 3 * n + p * 3 * n_p))
        del cur
    jax.block_until_ready(buf)
    return (PackedRows32 if pack else PackedRows)(buf)


# flat table bytes above which the scan-stacked streamed builder's padded
# (h, 3n, D) intermediate risks HBM exhaustion -> window-at-a-time builder
_BIGMEM_BYTES = 4.5 * 1024 ** 3


def _table_bytes(curve: CurveOps, rows: int, pack: bool) -> int:
    words = (48 if curve.name == "G2" else 24) * (1 if pack else 2)
    return rows * words * 4


def build_plan(curve: CurveOps, points: AffinePoint, cfg: P.MsmConfig,
               ches: bool = True, bgmw: bool = True, stock: bool = True,
               streamed: bool | None = None) -> MsmPlan:
    """Build all device tables for the requested algorithms.

    streamed: use the window-contiguous ("j"-layout) low-memory builder;
    None = auto (on from n >= 2^17, where the default builder's transient
    XYZZ stack would multiply the table's HBM footprint ~4x)."""
    n = points.X.shape[-1]
    if streamed is None:
        streamed = n >= (1 << 17)
    pack = pack_tables_default()
    rows = (lambda aff: curve.to_rows32(aff)) if pack else \
        (lambda aff: curve.to_rows(aff))
    plan = MsmPlan(curve=curve, cfg=cfg)
    plan.points = points
    # dual-method plans with matching radixes alias the nh BGMW table into
    # the 3nh CHES table's m=1 rows at query time (stride-3 slots — the
    # reference's reuse, main_p1.cpp:99-106): skip building/holding nh
    # (~2.4 GB HBM + build time at n=2^21 G1).
    alias_bgmw = (ches and bgmw and cfg.c == cfg.c_bgmw and cfg.h == cfg.h_bgmw)
    if alias_bgmw:
        bgmw = False
        plan.bgmw_stride3 = True
    if streamed:
        plan.layout = "j"
        if ches:
            plan.table3nh = build_ches_table_rows_streamed(curve, points, cfg,
                                                           pack=pack)
            _attach_ches_params(plan, cfg)
        if bgmw:
            plan.table_nh = build_bgmw_table_rows_streamed(curve, points, cfg,
                                                           pack=pack)
        return plan
    if ches:
        plan.table3nh = rows(build_ches_table(curve, points, cfg))
        _attach_ches_params(plan, cfg)
    if bgmw:
        plan.table_nh = rows(build_bgmw_table(curve, points, cfg))
    return plan


def _packed_table_for(cfg: P.MsmConfig):
    """Pairs layout by default (one row gather per digit in the device
    recode); MSM_RECODE_PAIRS=0 restores the flat table (two element
    gathers — the round-4 form)."""
    import os

    if os.environ.get("MSM_RECODE_PAIRS", "1") == "1":
        return P.packed_digit_table_pairs(cfg.q, cfg.ah)
    return P.packed_digit_table(cfg.q, cfg.ah)


def _attach_ches_params(plan: MsmPlan, cfg: P.MsmConfig) -> None:
    """Config-derived digit tables / bucket-gap constants (host-cheap)."""
    m_t, b_t, a_t, _ = P.digit_conversion_table(cfg.q, cfg.ah)
    plan.digit_tables = tuple(jnp.asarray(t) for t in (m_t, b_t, a_t))
    plan.value_to_index = jnp.asarray(P.bucket_value_to_index(cfg.q, cfg.ah))
    plan.packed_table = jnp.asarray(_packed_table_for(cfg))
    plan.packed_table_value = jnp.asarray(
        P.packed_digit_table_value(cfg.q, cfg.ah))
    bs = cfg.bucket_set()
    plan.bucket_gaps = np.diff(bs).astype(np.int32)
    assert plan.bucket_gaps.max() <= cfg.d_max
