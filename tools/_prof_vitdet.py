"""Capture a device trace of ViTDet ViT-B inference (2 batches)."""
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.config import LazyConfig, instantiate

cfg = LazyConfig.load("configs/ViTDet/mask_rcnn_vitdet_b_100ep.py")
model = instantiate(cfg.model)

B, H, W = 8, 1024, 1024
rng = np.random.RandomState(0)
batch = {
    "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8)),
    "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
}
params = model.init(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    {"image": batch["image"][:1], "image_sizes": batch["image_sizes"][:1]},
    train=False,
)
fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))
out = fwd(params, batch)
print("warm", float(np.asarray(out["scores"]).sum()))
with jax.profiler.trace("/tmp/jaxtrace_vitdet"):
    for _ in range(2):
        out = fwd(params, batch)
    float(np.asarray(out["scores"]).sum())
print("done")
