import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from self_supervise_sfm_tpu.ops import fused_qkv as FQ
from self_supervise_sfm_tpu.layers import rope as R
B, N, C, nh = int(sys.argv[1]), int(sys.argv[2]), 1024, 16
d = C // nh
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
args = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in
        [(C,), (C,), (C, 3*C), (3*C,), (d,), (d,), (d,), (d,)]]
pos = jnp.asarray(rng.uniform(0, 37, size=(N, 2)), jnp.float32)
cos, sin = R.rope_tables(pos, d)
t0 = time.perf_counter()
got = jax.jit(lambda x: FQ.fused_qkv_kernel(x, *args, cos, sin, num_heads=nh))(x)
jax.block_until_ready(got)
print("compile+run", round(time.perf_counter()-t0, 1), flush=True)
ref = FQ.reference_qkv(x, *args, cos, sin, num_heads=nh)
mx = max(float(jnp.max(jnp.abs(g.astype(jnp.float32) - r2.astype(jnp.float32)))) for g, r2 in zip(got, ref))
print("max_abs_diff", mx)
if len(sys.argv) > 3:  # timing loop
    def run(x):
        def body(i, acc):
            q, k, v = FQ.fused_qkv_kernel(x + i*jnp.bfloat16(1e-9), *args, cos, sin, num_heads=nh)
            return acc + jnp.sum(q.astype(jnp.float32)) + jnp.sum(k.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))
        return jax.lax.fori_loop(0, 50, body, jnp.float32(0.0))
    jf = jax.jit(run)
    t0 = time.perf_counter(); float(jf(x)); print("loop compile+first", round(time.perf_counter()-t0,1))
    for _ in range(2):
        t0 = time.perf_counter(); float(jf(x)); dt = (time.perf_counter()-t0)/50
        fl = 2*B*N*C*3*C
        print(f"per call: {dt*1e3:.3f} ms  {fl/dt/1e12:.1f} TFLOP/s")
