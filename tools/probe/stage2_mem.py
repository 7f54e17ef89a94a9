import sys; sys.path.insert(0, "/root/repo")
import jax, numpy as np, sys
import jax.numpy as jnp
from msm_blst_tpu.curves import G1
from msm_blst_tpu.msm import params
from msm_blst_tpu.msm.engine import MsmPlan, jit_msm_bign, PLAN_ARRAY_FIELDS
from msm_blst_tpu.msm import params as P
from msm_blst_tpu.curves.ops import PackedRows32

nexp = int(sys.argv[1]) if len(sys.argv) > 1 else 21
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2*1024*1024
cfg = params.CONFIGS[nexp]
n = cfg.n
rows = 3*cfg.h*n
S = jax.ShapeDtypeStruct
plan = MsmPlan(curve=G1, cfg=cfg, layout="j")
plan.table3nh = PackedRows32(S((rows, 24), jnp.uint32))
m_t, b_t, a_t, _ = P.digit_conversion_table(cfg.q, cfg.ah)
plan.digit_tables = tuple(S(t.shape, jnp.int32) for t in (m_t, b_t, a_t))
plan.value_to_index = S(((cfg.q>>1)+2,), jnp.int32)
plan.packed_table = S((cfg.q+1,), jnp.int32)
plan.packed_table_value = S((cfg.q+1,), jnp.int32)
plan.bucket_gaps = np.diff(cfg.bucket_set()).astype(np.int32)

run = jit_msm_bign(plan, "ches")
cands = [c.cell_contents for c in run.__closure__ if hasattr(c.cell_contents, 'lower')]
N = n*cfg.h
arrays = {f: getattr(plan, f) for f in PLAN_ARRAY_FIELDS if f != "points" and getattr(plan, f) is not None}
K = max(1, -(-N // chunk))
seg_len = (-(-N//K) // 1024 + 256) * 1024
for idx, st2 in enumerate(cands):
    for name, args in (("stage2", (S((N,), jnp.int32), S((N,), jnp.int32), arrays, seg_len, K)),
                       ("stage1", (S((8, n), jnp.uint32), arrays))):
        try:
            low = st2.lower(*args)
        except Exception as e:
            print(idx, name, "lower failed:", type(e).__name__, str(e)[:150])
            continue
        m = low.compile().memory_analysis()
        print(idx, name, "K", K, "seg_len", seg_len,
              "temp %.2fG args %.2fG out %.2fG" % (m.temp_size_in_bytes/1e9,
              m.argument_size_in_bytes/1e9, m.output_size_in_bytes/1e9))
        break
