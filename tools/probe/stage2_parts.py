import sys; sys.path.insert(0, "/root/repo")
import jax, numpy as np
import jax.numpy as jnp
from msm_blst_tpu.curves import G1
from msm_blst_tpu.curves.ops import PackedRows32, XyzzPoint
from msm_blst_tpu.msm import params
from msm_blst_tpu.msm.prefix_pipeline import (bucket_sums_prefix_ranged,
                                              segment_starts)
from msm_blst_tpu.msm.engine import integrate_gapped

cfg = params.CONFIGS[21]
n = cfg.n; N = n * cfg.h; B = cfg.b_size
rows = 3 * cfg.h * n
S = jax.ShapeDtypeStruct
chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 2*1024*1024
K = max(1, -(-N // chunk))
seg_len = (-(-N//K) // 1024 + 256) * 1024
gaps = np.diff(cfg.bucket_set()).astype(np.int32)

def buckets_fn(table_xy, slots, signs, keys, starts):
    return tuple(bucket_sums_prefix_ranged(
        G1, PackedRows32(table_xy), slots, signs, keys, B, starts, seg_len, K))

def integ_fn(bx, by, bzzz, bzz):
    return tuple(G1.xyzz_to_jac(integrate_gapped(
        G1, XyzzPoint(bx, by, bzzz, bzz), gaps)))

m1 = jax.jit(buckets_fn).lower(
    S((rows, 24), jnp.uint32), S((N,), jnp.int32), S((N,), jnp.bool_),
    S((N,), jnp.int32), S((K+1,), jnp.int32)).compile().memory_analysis()
print("buckets: temp %.2fG peak %.2fG" % (m1.temp_size_in_bytes/1e9, m1.peak_memory_in_bytes/1e9))
m2 = jax.jit(integ_fn).lower(*([S((24, B), jnp.uint32)]*4)).compile().memory_analysis()
print("integrate: temp %.2fG peak %.2fG" % (m2.temp_size_in_bytes/1e9, m2.peak_memory_in_bytes/1e9))
