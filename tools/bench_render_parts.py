import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/matry_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from matryodshka_tpu.geometry import intersect, render as render_lib
from matryodshka_tpu.geometry import sweep as sweep_lib
from matryodshka_tpu.ops import pallas_render as pr

H, W, P = 320, 640, 32
rng = np.random.RandomState(0)
layers = jnp.asarray(rng.rand(H, W, P, 4).astype(np.float32))
radii = jnp.asarray(sweep_lib.inv_depths(1.0, 100.0, P))
pose = jnp.eye(4); tgt = jnp.asarray([0.05, 0.0, 0.0])
CHAIN = 20

def chain(fn, consume):
    @jax.jit
    def c(layers, tgt):
        def body(_, l):
            o = fn(l, tgt)
            return l * 0.999 + consume(o)
        return jax.lax.fori_loop(0, CHAIN, body, layers)
    return c

def timeit(fn, iters=3):
    for _ in range(2): jax.block_until_ready(fn(layers, tgt))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(layers, tgt)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/(iters*CHAIN)*1000

mean = lambda o: jnp.mean(o) * 1e-6

# 1. prepare_layers only
f1 = chain(lambda l, t: pr.prepare_layers(l), lambda o: jnp.mean(o)*1e-6)
# 2. uv + tables only
def uv_tables(l, t):
    uv = intersect.intersect_sphere(pose, t, radii, W, H)
    uvm = jnp.transpose(uv[:, 16:H-16], (0, 3, 1, 2))
    tabs = pr._residual_tables(uvm[:, 0], uvm[:, 1], 16, 16, 64, 7)
    return uvm.sum() + sum(x.sum() for x in tabs).astype(jnp.float32)
f2 = chain(uv_tables, lambda o: o*1e-9)
# 3. kernel only (prep + uv outside chain)
lay_prep = jax.block_until_ready(pr.prepare_layers(layers))
uv_full = intersect.intersect_sphere(pose, tgt, radii, W, H)
uvm_prep = jnp.asarray(np.asarray(jnp.transpose(uv_full[:, 16:H-16], (0,3,1,2))))
@jax.jit
def kernel_chain(lay, uvm):
    def body(_, l):
        o = pr._ladder_render_mid(l, uvm, 16, 16, 64, 7)
        return l * 0.999 + jnp.mean(o)*1e-6
    return jax.lax.fori_loop(0, CHAIN, body, lay)
for _ in range(2): jax.block_until_ready(kernel_chain(lay_prep, uvm_prep))
t0=time.perf_counter()
for _ in range(3): out = kernel_chain(lay_prep, uvm_prep)
jax.block_until_ready(out)
ms_kernel = (time.perf_counter()-t0)/(3*CHAIN)*1000
# 4. caps only
def caps(l, t):
    uv = intersect.intersect_sphere(pose, t, radii, W, H)
    top = render_lib._cap_over(l, uv[:, :16], True, 16); bot = render_lib._cap_over(l, uv[:, H-16:], False, 16)
    return top + bot
f4 = chain(caps, lambda o: jnp.mean(o)*1e-6)
# 5. full dispatch
f5 = chain(lambda l, t: render_lib.render_equirect_view(l, pose, t, radii, use_pallas=True),
           lambda o: jnp.mean(o)*1e-6)

print(f"prepare_layers : {timeit(f1):.2f} ms")
print(f"uv+tables      : {timeit(f2):.2f} ms")
print(f"kernel only    : {ms_kernel:.2f} ms")
print(f"caps (gather)  : {timeit(f4):.2f} ms")
print(f"full dispatch  : {timeit(f5):.2f} ms")
