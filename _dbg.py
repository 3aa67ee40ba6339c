import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import sys
sys.path.insert(0, "tests")
from test_shardmap import (reference_steps, make_model, make_batch, FixedPool,
                           FixedCorruptions, N_E, B, make_mesh,
                           make_shardmap_pairwise_step, shard_state_shardmap)
from skge_tpu import AdaGrad, init_state

model = make_model("transe")
opt = AdaGrad(lr=0.1)
margin = 0.7
batch = make_batch(5)
mask = jnp.ones(B, jnp.float64)
rng = np.random.default_rng(6)
sampler = FixedPool(jnp.asarray(rng.integers(0, N_E, 9), jnp.int32))

want, (wloss, wnviol) = reference_steps(model, opt, sampler, batch, mask, margin, nsteps=1)
mesh = make_mesh(jax.devices()[:8], shape=(4, 2))
step = make_shardmap_pairwise_step(model, opt, sampler, margin, mesh)
state = shard_state_shardmap(init_state(model, opt, jax.random.PRNGKey(4)), model, mesh)
state, m = step(state, batch, mask)
print("loss", float(m.loss), float(wloss), "nviol", int(m.nviolations), int(wnviol))
for k in want.params:
    d = np.abs(np.asarray(state.params[k]) - np.asarray(want.params[k]))
    print("param", k, "maxdiff", d.max(), "rows>tol:", np.where(d.max(axis=tuple(range(1,d.ndim)))>1e-9)[0][:10])
    dp = np.abs(np.asarray(state.opt_state[k]["p2"]) - np.asarray(want.opt_state[k]["p2"]))
    print("   p2 maxdiff", dp.max())
