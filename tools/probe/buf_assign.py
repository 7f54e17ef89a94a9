import sys; sys.path.insert(0, "/root/repo")
import jax, numpy as np
import jax.numpy as jnp
from msm_blst_tpu.curves import G1
from msm_blst_tpu.curves.ops import PackedRows32
from msm_blst_tpu.msm import params
from msm_blst_tpu.msm.prefix_pipeline import bucket_sums_prefix_ranged

cfg = params.CONFIGS[21]
n = cfg.n; N = n * cfg.h; B = cfg.b_size
rows = 3 * cfg.h * n
S = jax.ShapeDtypeStruct
chunk = 2*1024*1024
K = max(1, -(-N // chunk))
seg_len = (-(-N//K) // 1024 + 256) * 1024

def buckets_fn(table_xy, slots, signs, keys, starts):
    return tuple(bucket_sums_prefix_ranged(
        G1, PackedRows32(table_xy), slots, signs, keys, B, starts, seg_len, K))

comp = jax.jit(buckets_fn).lower(
    S((rows, 24), jnp.uint32), S((N,), jnp.int32), S((N,), jnp.bool_),
    S((N,), jnp.int32), S((K+1,), jnp.int32)).compile()
m = comp.memory_analysis()
proto = m.serialized_buffer_assignment_proto
from jax._src.lib import _jax  # may expose proto parsing; fallback manual
try:
    from xla.service import buffer_assignment_pb2  # unlikely packaged
except Exception:
    buffer_assignment_pb2 = None
if buffer_assignment_pb2 is None:
    # crude parse: varint scan not worth it; instead dump HLO text allocations
    txt = comp.as_text()
    open("/tmp/stage2_hlo.txt", "w").write(txt)
    print("wrote hlo text", len(txt))
else:
    ba = buffer_assignment_pb2.BufferAssignmentProto.FromString(proto)
    allocs = sorted(ba.buffer_allocations, key=lambda a: -a.size)[:12]
    for a in allocs:
        print(f"{a.size/1e9:.2f}G maybe_live_out={a.maybe_live_out} param={a.is_entry_computation_parameter}")
