"""ViTDet ViT-B Mask R-CNN, 100-epoch LSJ recipe
(analogue of reference projects/ViTDet/configs/COCO/mask_rcnn_vitdet_b_100ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.data import transforms as T
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from ..common.data.coco import dataloader
from ..common.models.mask_rcnn_vitdet import model  # noqa

train = dict(
    output_dir="./output/vitdet_b",
    init_checkpoint="",
    max_iter=184375,  # 100 ep on COCO with batch 64
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)

lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[163889, 177546],
            num_updates=184375,
        ),
        warmup_factor=0.001,
        warmup_length=250 / 184375,
    ),
    max_iter=184375,
    base_lr=1e-4,
)


def make_optimizer(params, base_lr=1e-4, weight_decay=0.1, lr_decay_rate=0.7, num_layers=12):
    """AdamW with ViT layer-wise lr decay (reference vit.py:506 recipe)."""
    import jax
    import optax

    from detectron2_tpu.modeling.backbone.vit import get_vit_lr_decay_rate

    def label(path, leaf):
        keys = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return round(get_vit_lr_decay_rate(keys, lr_decay_rate, num_layers), 6)

    labels = jax.tree_util.tree_map_with_path(label, params)
    groups = sorted({x for x in jax.tree_util.tree_leaves(labels)})
    transforms = {
        g: optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(learning_rate=lambda s: base_lr * g, b1=0.9, b2=0.999, weight_decay=weight_decay),
        )
        for g in groups
    }
    return optax.multi_transform(transforms, labels)


optimizer = L(make_optimizer)(params=None)

# LSJ onto a fixed 1024 square (reference projects/ViTDet/configs/common/
# coco_loader_lsj.py)
image_size = 1024
dataloader.train.mapper.augmentations = [
    L(T.RandomFlip)(horizontal=True),
    L(T.ResizeScale)(
        min_scale=0.1, max_scale=2.0, target_height=image_size, target_width=image_size
    ),
    L(T.FixedSizeCrop)(crop_size=(image_size, image_size)),
]
dataloader.train.mapper.use_instance_mask = True
dataloader.train.mapper.recompute_boxes = True
dataloader.train.mapper.image_format = "RGB"
dataloader.train.total_batch_size = 64
dataloader.test.mapper.augmentations = [
    L(T.ResizeShortestEdge)(short_edge_length=image_size, max_size=image_size)
]
dataloader.test.mapper.image_format = "RGB"
