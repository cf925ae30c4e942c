"""ViTDet Cascade Mask R-CNN MViTv2-B (IN21k) on LVIS v1 (analogue of
reference projects/ViTDet/configs/LVIS/cascade_mask_rcnn_mvitv2_b_in21k_100ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.data import transforms as T

from ...common.data.lvis import dataloader
from ..cascade_mask_rcnn_mvitv2_b_in21k_100ep import lr_multiplier, model, optimizer, train  # noqa


def _fed_loss_weights():
    from detectron2_tpu.data.detection_utils import get_fed_loss_cls_weights

    return tuple(float(x) for x in get_fed_loss_cls_weights("lvis_v1_train", 0.5))


# LSJ onto a fixed 1024 square, RGB
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

model.roi_heads.num_classes = 1203
model.roi_heads.mask_head.num_classes = 1203
for pred in model.roi_heads.box_predictor:
    pred.num_classes = 1203
    pred.test_score_thresh = 0.02
    pred.test_topk_per_image = 300
    pred.use_sigmoid_ce = True
    pred.use_fed_loss = True
    pred.fed_loss_cls_weights = L(_fed_loss_weights)()

# 100 ep = 156250 iters * 64 images/iter / 100000 images/ep
train["max_iter"] = 156250
train["eval_period"] = 30000
lr_multiplier.multiplier.scheduler.milestones = [138889, 150463]
lr_multiplier.multiplier.scheduler.num_updates = train["max_iter"]
lr_multiplier.multiplier.warmup_length = 250 / train["max_iter"]
lr_multiplier.max_iter = train["max_iter"]

train["output_dir"] = "./output/lvis_cascade_mvitv2_b_in21k_100ep"
