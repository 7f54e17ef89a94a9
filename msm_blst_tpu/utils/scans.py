"""Compile-lean scan/fold primitives for expensive commutative monoids.

`lax.associative_scan` instantiates its combiner ~2·log2(N) times, which is
intractable to compile when the combiner is a multi-hundred-op field or curve
formula. The *sequential-column* scheme here traces the combiner exactly once
per recursion level (2-3 levels total): reshape the stream into (n_chunks,
chunk) contiguous rows and lax.scan along the chunk axis so all chunks advance
in parallel at full vector width.

Requirements: `combine` must be associative and commutative, and tolerate
arbitrary padding garbage in lanes that are later sliced away (true for
modular arithmetic and for EC point ops with all-zero = infinity padding).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

DEFAULT_CHUNK = 256
# Target lane width per sequential scan step: below this the VPU is
# launch-overhead bound; above it extra width stops paying for depth.
TARGET_LANES = 8192


def pick_chunk(n: int, chunk: int = DEFAULT_CHUNK) -> int:
    """Columns per chunk balancing sequential depth (c), lane width (n/c),
    and compile cost (recursion levels trace the combiner once each):
    just enough columns to keep ~TARGET_LANES lanes busy per step, floored
    at 32 columns so big streams stay at <= ~4 levels; tiny streams take a
    single narrow level (cheapest to compile)."""
    if n <= 16:  # terminal sizes: one narrow level
        return n
    if n >= 8 * TARGET_LANES:  # big: width-bound, ~TARGET_LANES lanes/step
        return max(32, min(chunk, -(-n // TARGET_LANES)))
    # mid: ~cbrt(n) columns -> ~3 levels, steps ~3 n^(1/3) instead of ~n
    return max(16, min(chunk, int(round(n ** (1 / 3))) + 1))


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_last(x, pad: int, fill=0):
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=fill)


def tree_map_last(fn, tree):
    import jax

    return jax.tree_util.tree_map(fn, tree)


def _to_cols(tree, n_ch: int, chunk: int):
    return tree_map_last(lambda x: x.reshape(x.shape[:-1] + (n_ch, chunk)), tree)


def _pad_tree(tree, pad: int):
    return tree_map_last(lambda x: _pad_last(x, pad), tree)


def _col(tree, j: int):
    return tree_map_last(lambda x: x[..., j], tree)


def _cols_to_scan_xs(tree):
    """(…, n_ch, chunk) -> xs for lax.scan over columns 1..chunk-1."""
    return tree_map_last(lambda x: jnp.moveaxis(x[..., 1:], -1, 0), tree)


def _stack_to_stream(tree_stacked):
    """(chunk, …, n_ch) stacked scan ys -> (…, n_ch*chunk) in stream order
    (stream index = k*chunk + j)."""
    return tree_map_last(
        lambda x: jnp.moveaxis(x, 0, -1).reshape(x.shape[1:-1] + (-1,)),
        tree_stacked,
    )


def _last_dim(tree) -> int:
    import jax

    return jax.tree_util.tree_leaves(tree)[0].shape[-1]


def fold(combine, tree, chunk: int = DEFAULT_CHUNK):
    """Reduce along the last axis -> size-1 batch. O(levels) combiner traces."""
    N = _last_dim(tree)
    while N > 1:
        c = pick_chunk(N, chunk)
        n_ch = _ceil_to(N, c) // c
        t = _pad_tree(tree, n_ch * c - N)
        cols = _to_cols(t, n_ch, c)
        init = _col(cols, 0)
        if c > 1:
            xs = _cols_to_scan_xs(cols)
            acc, _ = lax.scan(lambda carry, col: (combine(carry, col), None), init, xs)
        else:
            acc = init
        tree = acc
        N = n_ch
    return tree


def prefix_scan(combine, tree, chunk: int = DEFAULT_CHUNK):
    """Inclusive prefix scan along the last axis, full width."""
    N = _last_dim(tree)
    if N == 1:
        return tree
    c = pick_chunk(N, chunk)
    n_ch = _ceil_to(N, c) // c
    t = _pad_tree(tree, n_ch * c - N)
    cols = _to_cols(t, n_ch, c)
    init = _col(cols, 0)

    def body(carry, col):
        acc = combine(carry, col)
        return acc, acc

    import jax

    if c > 1:
        xs = _cols_to_scan_xs(cols)
        tails, scans = lax.scan(body, init, xs)
        full = jax.tree_util.tree_map(
            lambda i, s: jnp.concatenate([i[None], s], axis=0), init, scans
        )
        stream = _stack_to_stream(full)
    else:
        tails = init
        stream = t
    if n_ch > 1:
        tails_scan = prefix_scan(combine, tails, chunk)
        # chunk k >= 1 gets the inclusive prefix of chunks < k
        carry = tree_map_last(lambda x: x[..., :-1], tails_scan)
        carry_rep = tree_map_last(lambda x: jnp.repeat(x, c, axis=-1), carry)
        head = tree_map_last(lambda x: x[..., :c], stream)
        rest = tree_map_last(lambda x: x[..., c:], stream)
        combined = combine(carry_rep, rest)
        stream = jax.tree_util.tree_map(
            lambda h, r: jnp.concatenate([h, r], axis=-1), head, combined
        )
    return tree_map_last(lambda x: x[..., :N], stream)


def suffix_scan(combine, tree, chunk: int = DEFAULT_CHUNK):
    """Inclusive suffix scan along the last axis (reverse + prefix + reverse)."""
    rev = tree_map_last(lambda x: x[..., ::-1], tree)
    out = prefix_scan(combine, rev, chunk)
    return tree_map_last(lambda x: x[..., ::-1], out)
