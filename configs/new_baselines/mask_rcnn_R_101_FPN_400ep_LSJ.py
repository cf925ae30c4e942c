"""Mask R-CNN R101-FPN LSJ 400ep — R50 recipe with a deeper backbone."""

from .mask_rcnn_R_50_FPN_400ep_LSJ import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

model.depth = 101
