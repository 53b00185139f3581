"""Find the exact flax equivalent of torch ConvTranspose3d k3/s2/p1/op1
and k3/s1/p1/op0 for the CVPMVS CostRegNet port."""
import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import linen as nn

torch.manual_seed(0)
B, D, H, W, Ci, Co = 1, 4, 6, 8, 5, 3
x_t = torch.randn(B, Ci, D, H, W)
x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))

# ---- stride 1, output_padding 0
tconv1 = torch.nn.ConvTranspose3d(Ci, Co, 3, stride=1, padding=1,
                                  output_padding=0, bias=False)
with torch.no_grad():
    y1 = tconv1(x_t).numpy()
w = tconv1.weight.detach().numpy()  # (Ci, Co, 3, 3, 3)
# stride-1 transpose conv == plain conv with flipped kernel, channels swapped
k1 = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()
conv = nn.Conv(Co, (3, 3, 3), padding=1, use_bias=False)
v = conv.init(jax.random.PRNGKey(0), x_j)
v = {"params": {"kernel": jnp.asarray(k1)}}
y1j = np.asarray(conv.apply(v, x_j)).transpose(0, 4, 1, 2, 3)
print("s1 flip:", np.abs(y1 - y1j).max())

# ---- stride 2, padding 1, output_padding 1
tconv2 = torch.nn.ConvTranspose3d(Ci, Co, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
with torch.no_grad():
    y2 = tconv2(x_t).numpy()
w2 = tconv2.weight.detach().numpy()
print("torch out:", y2.shape)
for flip in (False, True):
    k2 = np.transpose(w2, (2, 3, 4, 0, 1))
    if flip:
        k2 = k2[::-1, ::-1, ::-1].copy()
    ct = nn.ConvTranspose(Co, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                          use_bias=False)
    v2 = {"params": {"kernel": jnp.asarray(k2)}}
    y2j = np.asarray(ct.apply(v2, x_j))
    print(f"s2 SAME flip={flip}: out={y2j.shape}",
          np.abs(y2 - y2j.transpose(0, 4, 1, 2, 3)).max()
          if y2j.shape[1:4] == y2.shape[2:] else "shape mismatch")
