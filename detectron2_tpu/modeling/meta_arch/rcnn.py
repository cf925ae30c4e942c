"""GeneralizedRCNN: backbone (+FPN) -> RPN -> ROI heads.

Parity with reference detectron2/modeling/meta_arch/rcnn.py:25-341, with the
TPU batch contract: the device step takes one fixed-shape batch dict

    {"image": [B, H, W, C] (uint8 or float, NHWC, padded),
     "image_sizes": [B, 2] int (true h, w),
     optional padded targets: gt_boxes [B,G,4], gt_classes [B,G],
     gt_valid [B,G], gt_masks [B,G,Ms,Ms], gt_keypoints [B,G,K,3]}

instead of a list of per-image dicts. Normalization happens in-graph (uint8
pixels cross PCIe, the (x - mean)/std runs on device), and the conv tower runs
in a configurable compute dtype (bf16 by default).
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.proposal_generator import build_proposal_generator
from detectron2_tpu.modeling.roi_heads import build_roi_heads

__all__ = ["GeneralizedRCNN", "ProposalNetwork"]


@META_ARCH_REGISTRY.register()
class GeneralizedRCNN(nn.Module):
    """Any model with 1. per-image feature extraction 2. region proposals
    3. per-region prediction (reference rcnn.py:25)."""

    backbone: Backbone
    proposal_generator: Optional[nn.Module]
    roi_heads: nn.Module
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    input_format: str = "BGR"
    compute_dtype: str = "bfloat16"
    vis_period: int = 0
    mask_paste_in_graph: bool = False

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        return cls(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, backbone.output_shape()),
            roi_heads=build_roi_heads(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            input_format=cfg.INPUT.FORMAT,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            vis_period=cfg.VIS_PERIOD,
            mask_paste_in_graph=cfg.TPU.PASTE_MASKS_IN_GRAPH,
        )

    def preprocess_image(self, image: jnp.ndarray) -> jnp.ndarray:
        """(x - mean) / std in-graph, then cast to the compute dtype
        (reference rcnn.py:223, minus the padding which happens host-side)."""
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = (image.astype(jnp.float32) - mean) / std
        return x.astype(jnp.dtype(self.compute_dtype))

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        """
        Returns:
            train: dict of scalar losses.
            eval: padded detections dict (pred_boxes [B,D,4] in the network
            input frame, scores, pred_classes, valid, optional pred_masks
            [B,D,M,M], pred_keypoints) — rescale to original image sizes with
            ``detector_postprocess``.
        """
        images = self.preprocess_image(batch["image"])
        image_sizes = batch["image_sizes"]
        features = self.backbone(images, train=train)

        if not train and "given_boxes" in batch:
            # Inference on externally provided detection boxes: skip RPN and
            # the box branch, run only mask/keypoint heads (the reference's
            # `inference(detected_instances=...)` path used by TTA,
            # rcnn.py:178-208 + test_time_augmentation.py:228).
            detections = {
                "pred_boxes": batch["given_boxes"],
                "pred_classes": batch["given_classes"],
                "scores": batch.get(
                    "given_scores", jnp.ones(batch["given_classes"].shape, jnp.float32)
                ),
                "valid": batch["given_valid"],
            }
            return self.roi_heads.forward_with_given_boxes(features, detections)

        gt_boxes = batch.get("gt_boxes")
        gt_valid = batch.get("gt_valid")

        if self.proposal_generator is not None:
            (prop_boxes, prop_logits, prop_valid), proposal_losses = self.proposal_generator(
                features, image_sizes, gt_boxes=gt_boxes, gt_valid=gt_valid, train=train
            )
        else:
            prop_boxes = batch["proposal_boxes"]
            prop_logits = batch["proposal_logits"]
            prop_valid = batch["proposal_valid"]
            proposal_losses = {}

        targets = None
        if train:
            targets = {k: batch[k] for k in batch if k.startswith("gt_")}

        detections, detector_losses = self.roi_heads(
            features,
            prop_boxes,
            prop_logits,
            prop_valid,
            image_sizes,
            targets=targets,
            train=train,
        )

        if train:
            losses = {}
            losses.update(detector_losses)
            losses.update(proposal_losses)
            return losses

        if self.mask_paste_in_graph and "pred_masks" in detections:
            # Materialize full network-frame masks on device (reference
            # _postprocess pastes on the accelerator too, mask_ops.py:74).
            from detectron2_tpu.ops.paste_masks import paste_masks_in_image

            H, W = images.shape[1], images.shape[2]
            detections["pred_masks_full"] = jax.vmap(
                lambda m, b: paste_masks_in_image(m, b, (H, W), fast=True, chunk=20)
            )(detections["pred_masks"], detections["pred_boxes"])
        return detections


@META_ARCH_REGISTRY.register()
class ProposalNetwork(nn.Module):
    """RPN-only model (reference rcnn.py:254-341)."""

    backbone: Backbone
    proposal_generator: nn.Module
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    compute_dtype: str = "bfloat16"

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        return cls(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = ((batch["image"].astype(jnp.float32) - mean) / std).astype(
            jnp.dtype(self.compute_dtype)
        )
        features = self.backbone(images, train=train)
        (boxes, logits, valid), losses = self.proposal_generator(
            features,
            batch["image_sizes"],
            gt_boxes=batch.get("gt_boxes"),
            gt_valid=batch.get("gt_valid"),
            train=train,
        )
        if train:
            return losses
        return {"proposal_boxes": boxes, "proposal_logits": logits, "valid": valid}
