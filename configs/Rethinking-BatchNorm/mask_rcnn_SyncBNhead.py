"""Mask R-CNN with cross-replica SyncBN heads (analogue of reference
projects/Rethinking-BatchNorm/configs/mask_rcnn_SyncBNhead.py). On TPU,
SyncBN is a psum over the data mesh axis inside the compiled step."""

from .mask_rcnn_BNhead import lr_multiplier, model, train  # noqa

model.roi_heads.box_head.conv_norm = model.roi_heads.mask_head.conv_norm = "SyncBN"
train["output_dir"] = "./output/mask_rcnn_SyncBNhead"
