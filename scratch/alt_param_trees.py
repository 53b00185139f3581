"""Print param paths of the alternate depth models (tiny init) for the
torch-port entry tables."""
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models import depth_alternates as alt

cfg = SfMConfig.kitti(nlabel=4).depth
cfg = cfg.__class__(**{**cfg.__dict__, "regnet_sample_num": 3})
ref = jnp.zeros((1, 64, 96, 3))
tgt = ref[:, None]
pose = jnp.concatenate(
    [jnp.eye(3)[None], jnp.asarray([[[0.5], [0.0], [0.1]]])], -1
)[:, None]
K = jnp.asarray([[[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]]])
Ki = jnp.linalg.inv(K)

for name in ("PANet", "REGNet", "REG2D", "DISPNET"):
    net = getattr(alt, name)(cfg)
    v = net.init(jax.random.PRNGKey(0), ref, tgt, pose, K, Ki, False)
    print(f"===== {name}")
    for p, leaf in jax.tree_util.tree_flatten_with_path(v["params"])[0]:
        print(" ", jax.tree_util.keystr(p), leaf.shape)
