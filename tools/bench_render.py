import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/matry_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from matryodshka_tpu.geometry import intersect, render as render_lib
from matryodshka_tpu.geometry import sweep as sweep_lib

print("devices", jax.devices(), file=sys.stderr)
H, W, P = 320, 640, 32
rng = np.random.RandomState(0)
layers = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))
radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
pose = jnp.eye(4)
tgt = jnp.asarray([0.05, 0.0, 0.0])

@jax.jit
def render_pallas(layers, tgt):
    return render_lib.render_equirect_view(layers, pose, tgt, radii, use_pallas=True)

@jax.jit
def render_gather(layers, tgt):
    return render_lib.render_equirect_view(layers, pose, tgt, radii)

t0=time.time()
out_p = jax.block_until_ready(render_pallas(layers, tgt))
print(f"pallas compile+run {time.time()-t0:.1f}s", file=sys.stderr)
out_g = jax.block_until_ready(render_gather(layers, tgt))
err = jnp.abs(out_p - out_g)
print("max abs err vs gather:", float(err.max()))
import numpy as np_
rows = np_.asarray(err.max(axis=(1,2)))
print("bad rows:", np_.nonzero(rows > 1e-2)[0][:50], file=sys.stderr)

def timeit(fn, iters=20):
    for _ in range(3): jax.block_until_ready(fn(layers, tgt))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(layers, tgt)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters*1000

# chain to remove dispatch overhead
CHAIN=20
@jax.jit
def chain_p(layers, tgt):
    def body(_, l):
        o = render_pallas(l[..., :4].reshape(H,W,P,4), tgt)
        return l * 0.999 + jnp.mean(o) * 1e-6
    return jax.lax.fori_loop(0, CHAIN, body, layers)
@jax.jit
def chain_g(layers, tgt):
    def body(_, l):
        o = render_gather(l[..., :4].reshape(H,W,P,4), tgt)
        return l * 0.999 + jnp.mean(o) * 1e-6
    return jax.lax.fori_loop(0, CHAIN, body, layers)

def timeit_chain(fn, iters=3):
    for _ in range(2): jax.block_until_ready(fn(layers, tgt))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(layers, tgt)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/(iters*CHAIN)*1000

print(f"pallas render: {timeit_chain(chain_p):.2f} ms  (unchained {timeit(render_pallas):.2f})")
print(f"gather render: {timeit_chain(chain_g):.2f} ms  (unchained {timeit(render_gather):.2f})")
