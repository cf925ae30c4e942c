"""PointSup config keys (reference projects/PointSup/point_sup/config.py)."""


def add_point_sup_config(cfg):
    """Add config for point supervision."""
    # use point annotation (instead of dense masks) for the mask branch
    cfg.INPUT.POINT_SUP = True
    # number of annotated points per instance the loader samples
    cfg.INPUT.SAMPLE_POINTS = 5
    cfg.MODEL.ROI_HEADS.NAME = "PointSupROIHeads"
