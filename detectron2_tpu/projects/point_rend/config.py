"""PointRend config keys (reference projects/PointRend/point_rend/config.py)."""

from detectron2_tpu.config.cfg_node import CfgNode as CN


def add_pointrend_config(cfg):
    """Add config for PointRend."""
    # crops sampled until no single category covers more than this fraction
    # (reference point_rend/config.py:13; the cityscapes semantic recipes)
    cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA = 1.0
    cfg.INPUT.COLOR_AUG_SSD = False

    # Implicit PointRend (reference config.py add_pointrend_config tail)
    cfg.MODEL.IMPLICIT_POINTREND = CN()
    cfg.MODEL.IMPLICIT_POINTREND.IMAGE_FEATURE_ENABLED = True
    cfg.MODEL.IMPLICIT_POINTREND.POS_ENC_ENABLED = True
    cfg.MODEL.IMPLICIT_POINTREND.PARAMS_L2_REGULARIZER = 0.00001

    cfg.MODEL.ROI_HEADS.NAME = "PointRendROIHeads"
    cfg.MODEL.ROI_MASK_HEAD.NAME = "CoarseMaskHead"
    # side of the coarse prediction (upsampled by the subdivision loop)
    cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 1024
    cfg.MODEL.ROI_MASK_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14

    cfg.MODEL.POINT_HEAD = CN()
    cfg.MODEL.POINT_HEAD.NAME = "StandardPointHead"
    # the per-pixel head PointRendSemSegHead refines
    cfg.MODEL.POINT_HEAD.COARSE_SEM_SEG_HEAD_NAME = "SemSegFPNHead"
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 80
    # fine-grained features come from these (high-res) levels
    cfg.MODEL.POINT_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 14 * 14
    cfg.MODEL.POINT_HEAD.OVERSAMPLE_RATIO = 3
    cfg.MODEL.POINT_HEAD.IMPORTANCE_SAMPLE_RATIO = 0.75
    # 2 subdivision steps take the 7x7 coarse mask to the 28x28 output the
    # paste pipeline consumes (the reference renders to 224 on the host; on
    # TPU the final bilinear refinement happens in paste_masks_padded)
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 28 * 28 // 4
    cfg.MODEL.POINT_HEAD.FC_DIM = 256
    cfg.MODEL.POINT_HEAD.NUM_FC = 3
    cfg.MODEL.POINT_HEAD.CLS_AGNOSTIC_MASK = False
    # concat coarse logits to every fc layer's input, not just the first
    cfg.MODEL.POINT_HEAD.COARSE_PRED_EACH_LAYER = True
