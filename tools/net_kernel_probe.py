import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/matry_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.models import msi as msi_lib
from matryodshka_tpu.training import state as state_lib
cfg = MatryConfig(height=320, width=640, num_psv_planes=32, num_msi_planes=32,
                  ngf=64, batch_size=1, compute_dtype="bfloat16").validate()
state, model = state_lib.init_state(cfg, jax.random.PRNGKey(0))
fused = msi_lib.fused_net_ops(model, state.params, cfg)
from matryodshka_tpu.ops import pallas_net
pc = cfg.num_psv_planes * 3
xp = jnp.zeros((pc, cfg.height + 2 * pallas_net.X_ROW_PAD, cfg.width), cfg.jnp_compute_dtype)
for attempt in range(3):
    try:
        t0 = time.time()
        jax.block_until_ready(pallas_net.unet_forward(
            (xp, xp), fused[0], fused[1], fused[2], flipped=fused[3], variant=fused[4]))
        print(f"attempt {attempt}: OK in {time.time()-t0:.0f}s", flush=True)
        break
    except Exception as e:
        print(f"attempt {attempt}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        time.sleep(5)
