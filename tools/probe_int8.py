import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

ROWS, H = 4096, 384
SHAPES = [("qkv", (ROWS, H), (H, 3*H)), ("out", (ROWS, H), (H, H)),
          ("fc1", (ROWS, H), (H, 4*H))]

def timed(fn, *args):
    float(fn(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter(); float(fn(*args)); best = min(best, time.perf_counter()-t0)
    return best

for name, xs, ws in SHAPES:
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, xs, jnp.bfloat16)
    w = jax.random.normal(key, ws, jnp.bfloat16)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32)*42.3), -127, 127).astype(jnp.int8)
    wscale = jnp.full((ws[1],), 1/42.3, jnp.float32)

    def make_bf16(n):
        @jax.jit
        def f(x, w):
            def body(acc, _):
                y = acc @ w
                y = y[:, :acc.shape[1]] if y.shape[1] != acc.shape[1] else y
                return jnp.tanh(y), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        return f

    def make_int8(n):
        @jax.jit
        def f(x, wq, wscale):
            def body(acc, _):
                ax = jnp.max(jnp.abs(acc)).astype(jnp.float32)/127.0
                xq = jnp.clip(jnp.round(acc.astype(jnp.float32)/ax), -127, 127).astype(jnp.int8)
                yi = jax.lax.dot_general(xq, wq, (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
                y = (yi.astype(jnp.float32)*ax*wscale).astype(jnp.bfloat16)
                y = y[:, :acc.shape[1]] if y.shape[1] != acc.shape[1] else y
                return jnp.tanh(y), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        return f

    NB, NS = 4000, 400
    tb = (timed(make_bf16(NB), x, w) - timed(make_bf16(NS), x, w)) / (NB-NS)
    ti = (timed(make_int8(NB), x, wq, wscale) - timed(make_int8(NS), x, wq, wscale)) / (NB-NS)
    flops = 2*xs[0]*ws[0]*ws[1]
    print(f"{name}: bf16 {tb*1e6:7.2f} us/it ({flops/tb/1e12:6.1f} TF/s)   "
          f"int8 {ti*1e6:7.2f} us/it ({flops/ti/1e12:6.1f} Top/s)   speedup {tb/ti:4.2f}x")
