"""DensePose config keys (reference projects/DensePose/densepose/config.py
add_densepose_head_config / add_densepose_head_cse_config — the modeling
subset; bootstrap/data-sampler keys are data-pipeline-only and omitted)."""

from detectron2_tpu.config.cfg_node import CfgNode as CN


def add_densepose_config(cfg):
    """Add config for the DensePose head (chart + CSE)."""
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.DENSEPOSE_ON = True

    cfg.MODEL.ROI_DENSEPOSE_HEAD = CN()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseV1ConvXHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 8
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 512
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL = 3
    # 24 body parts + background for the index head
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_PATCHES = 24
    # predictor deconv kernel + post-deconv bilinear upscale factor
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL = 4
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UP_SCALE = 2
    # 2 (fg/bg) or 15 (14 body parts + background) coarse channels
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_COARSE_SEGM_CHANNELS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_TYPE = "ROIAlignV2"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 28
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE = 112
    cfg.MODEL.ROI_DENSEPOSE_HEAD.INDEX_WEIGHTS = 5.0
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PART_WEIGHTS = 1.0
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POINT_REGRESSION_WEIGHTS = 0.01
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseChartWithConfidencePredictor"
    # loss family selector (reference config.py; dispatched by PREDICTOR_NAME
    # here — chart losses for chart predictors, CSE losses for embedding ones)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.LOSS_NAME = "DensePoseChartWithConfidenceLoss"
    # FPN decoder ahead of the densepose pooler (ON in the zoo configs)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_ON = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 256
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 256
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NORM = ""
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_COMMON_STRIDE = 4

    # DeepLab head variant (reference roi_heads/deeplab.py)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB = CN()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NORM = "GN"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NONLOCAL_ON = 0

    # UV confidence modeling (reference config.py add_densepose_head_config:
    # optional UV-symmetry table pickle for hflip augmentation (the official
    # UV_symmetry_transforms data; empty = identity UV on flip)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_SYMMETRY_PATH = ""
    # UV_CONFIDENCE; Neverova et al. NeurIPS 2019)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE = CN({"ENABLED": False})
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE = "iid_iso"  # iid_iso | indep_aniso
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.EPSILON = 0.01
    # segmentation confidence (the *M model variants; reference config.py:221)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_CONFIDENCE = CN({"ENABLED": False})
    cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_CONFIDENCE.EPSILON = 0.01

    # HRNet backbone (reference config.py add_hrnet_config — HigherHRNet w32)
    cfg.MODEL.HRNET = CN()
    cfg.MODEL.HRNET.STEM_INPLANES = 64
    for name, (mods, branches, blocks, chans) in {
        "STAGE2": (1, 2, [4, 4], [32, 64]),
        "STAGE3": (4, 3, [4, 4, 4], [32, 64, 128]),
        "STAGE4": (3, 4, [4, 4, 4, 4], [32, 64, 128, 256]),
    }.items():
        stage = CN()
        stage.NUM_MODULES = mods
        stage.NUM_BRANCHES = branches
        stage.BLOCK = "BASIC"
        stage.NUM_BLOCKS = blocks
        stage.NUM_CHANNELS = chans
        stage.FUSE_METHOD = "SUM"
        setattr(cfg.MODEL.HRNET, name, stage)
    cfg.MODEL.HRNET.HRFPN = CN()
    cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS = 256

    # Continuous Surface Embeddings (reference config.py add_densepose_head_cse_config)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE = CN()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_LOSS_WEIGHT = 0.6
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_LOSS_NAME = "EmbeddingLoss"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDING_DIST_GAUSS_SIGMA = 0.01
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.GEODESIC_DIST_GAUSS_SIGMA = 0.01
    # (mesh_name, num_vertices) pairs; smpl_27554 is the DensePose-COCO mesh
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS = [["smpl_27554", 27554]]
