import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig
from eovax.core.precision import DEFAULT_POLICY
from eovax.data.wavelengths import wavelengths_for
from eovax.models.backbone import EOVAECore
stem = StemConfig(num_layers=4, wv_planes=256)
core = EOVAECore(encoder_cfg=EncoderConfig(in_channels=12, stem=stem),
                 decoder_cfg=DecoderConfig(out_ch=12, stem=stem), policy=DEFAULT_POLICY)
wvs = jnp.asarray(wavelengths_for("S2L2A"))
x1 = jnp.zeros((1, 256, 256, 12), jnp.float32)
shapes = jax.eval_shape(lambda: core.init(jax.random.PRNGKey(0), x1, wvs,
                        sample_posterior=False, method=EOVAECore.forward))
r2 = np.random.default_rng(0)
variables = jax.tree_util.tree_map(
    lambda s: jnp.asarray(r2.normal(0, 0.02, s.shape).astype(np.dtype(s.dtype))), shapes)
variables["batch_stats"]["bn"]["mean"] = jnp.zeros_like(variables["batch_stats"]["bn"]["mean"])
variables["batch_stats"]["bn"]["var"] = jnp.ones_like(variables["batch_stats"]["bn"]["var"])
x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1024, 1024, 12)).astype(np.float32))
K = 10
@jax.jit
def loop(s, x, variables):
    def it(i, s):
        recon, _ = core.apply(variables, x + s.astype(x.dtype), wvs,
                              sample_posterior=False, method=EOVAECore.forward)
        return jnp.sum(recon.ravel()[:8].astype(jnp.float32)) * 1e-20
    return jax.lax.fori_loop(0, K, it, s)
s = jnp.zeros((), jnp.float32)
float(loop(s, x, variables)); float(loop(s, x, variables))
t0 = time.perf_counter()
float(loop(s, x, variables)); float(loop(s, x, variables))
dt = (time.perf_counter() - t0) / (2 * K) - 0.026 / K
print(f"1024x1024 single-tile reconstruct: {dt*1e3:.1f} ms", flush=True)
