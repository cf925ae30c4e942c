"""DensePose data pipeline: mapper + padded-batch collator
(reference projects/DensePose/densepose/data/dataset_mapper.py and
densepose/data/datasets/coco.py).

The mapper carries each person's ``dp_*`` chart annotations through the
geometric augmentations (as :class:`DensePoseDataRelative`, which is
box-relative so resizes/crops are absorbed by the transformed gt box; flips
swap part semantics via the symmetry tables) and attaches fixed-size padded
point arrays to the Instances. The collator stacks them into the batch
targets the compiled DensePose loss consumes:

    gt_dp_points [B, G, P, 2]  absolute (x, y) in the network input frame
    gt_dp_part   [B, G, P]     point part labels 1..24, -1 padding
    gt_dp_u/v    [B, G, P]     chart coordinates in [0, 1]
    gt_dp_vertex [B, G, P]     CSE GT vertex ids, -1 padding (cse splits)
    gt_dp_mesh_id [B, G]       MeshCatalog id of each instance's mesh, -1 pad
"""

import copy
from typing import Any, Dict, List, Optional

import numpy as np

from detectron2_tpu.config import configurable
from detectron2_tpu.data import detection_utils as utils
from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.build import PaddedBatchCollator
from detectron2_tpu.data.dataset_mapper import DatasetMapper
from detectron2_tpu.projects.densepose.structures import (
    DensePoseDataRelative,
    DensePoseTransformData,
)

__all__ = ["DensePoseDatasetMapper", "DensePoseBatchCollator", "DP_MAX_POINTS"]

# DensePose COCO annotations have at most ~184 collected points per person;
# the reference samples its losses at all of them
DP_MAX_POINTS = 196


class DensePoseDatasetMapper(DatasetMapper):
    """DatasetMapper that additionally transforms + packs dp_* annotations
    (reference densepose/data/dataset_mapper.py:27-125)."""

    @configurable
    def __init__(self, *args, densepose_transform_data: Optional[DensePoseTransformData] = None,
                 max_points: int = DP_MAX_POINTS, **kwargs):
        super().__init__(*args, **kwargs)
        self.densepose_transform_data = densepose_transform_data or DensePoseTransformData()
        self.max_points = max_points

    @classmethod
    def from_config(cls, cfg, is_train: bool = True):
        ret = super().from_config(cfg, is_train)
        tdata = None
        fpath = ""
        if hasattr(cfg.MODEL, "ROI_DENSEPOSE_HEAD"):
            fpath = getattr(cfg.MODEL.ROI_DENSEPOSE_HEAD, "UV_SYMMETRY_PATH", "")
        if fpath:
            tdata = DensePoseTransformData.load(fpath)
        ret["densepose_transform_data"] = tdata
        return ret

    def _transform_annotations(self, dataset_dict, transforms, image_shape):
        # extract dp_* BEFORE the base transform strips the dicts, one entry
        # per non-crowd annotation (the same records the base keeps)
        dp_datas = []
        for obj in dataset_dict["annotations"]:
            if obj.get("iscrowd", 0):
                continue
            ok, _ = DensePoseDataRelative.validate_annotation(obj)
            if ok and (
                DensePoseDataRelative.I_KEY in obj
                or DensePoseDataRelative.VERTEX_IDS_KEY in obj
            ):
                dp = DensePoseDataRelative(obj, cleanup=True)
                dp.apply_transform(transforms, self.densepose_transform_data)
                dp_datas.append(dp)
            else:
                DensePoseDataRelative.cleanup_annotation(obj)
                dp_datas.append(None)

        # base transform WITHOUT empty filtering: attach the dp point arrays
        # first so the filter drops them in lockstep with the other fields
        annos = [
            utils.transform_instance_annotations(
                obj, transforms, image_shape, keypoint_hflip_indices=self.keypoint_hflip_indices
            )
            for obj in dataset_dict.pop("annotations")
            if obj.get("iscrowd", 0) == 0
        ]
        instances = utils.annotations_to_instances(
            annos, image_shape, mask_format=self.instance_mask_format
        )
        if self.recompute_boxes and instances.has("gt_masks"):
            instances.gt_boxes = instances.gt_masks.get_bounding_boxes()
        assert len(dp_datas) == len(instances), (len(dp_datas), len(instances))

        G = len(instances)
        P = self.max_points
        pts = np.zeros((G, P, 2), np.float32)
        part = np.full((G, P), -1, np.int64)
        u = np.zeros((G, P), np.float32)
        v = np.zeros((G, P), np.float32)
        vert = np.full((G, P), -1, np.int64)
        mesh_id = np.full((G,), -1, np.int64)
        boxes = np.asarray(instances.gt_boxes.tensor, np.float64) if G else np.zeros((0, 4))
        for g, dp in enumerate(dp_datas[:G]):
            if dp is None:
                continue
            n = min(len(dp.x), P)
            x0, y0, x1, y1 = boxes[g]
            w = max(x1 - x0, 1e-4)
            h = max(y1 - y0, 1e-4)
            # box-relative [0, 255] -> absolute input-frame coordinates
            # (reference data_relative.py docstring: x_img = x0 + x * w / 256)
            pts[g, :n, 0] = x0 + dp.x[:n] * w / DensePoseDataRelative.MASK_SIZE
            pts[g, :n, 1] = y0 + dp.y[:n] * h / DensePoseDataRelative.MASK_SIZE
            if hasattr(dp, "i"):
                part[g, :n] = dp.i[:n]
                u[g, :n] = np.clip(dp.u[:n], 0.0, 1.0)
                v[g, :n] = np.clip(dp.v[:n], 0.0, 1.0)
            if hasattr(dp, "vertex_ids"):
                # CSE annotations: GT vertex id per point + the instance's
                # mesh (ref_model -> catalog id; reference data_relative.py:67,
                # meshes/catalog.py get_mesh_id)
                vert[g, :n] = dp.vertex_ids[:n]
                from detectron2_tpu.projects.densepose.meshes import MeshCatalog

                name = getattr(dp, "mesh_name", None) or "smpl_27554"
                if name in MeshCatalog.mesh_ids:
                    mesh_id[g] = MeshCatalog.get_mesh_id(name)

        instances.gt_dp_points = pts
        instances.gt_dp_part = part
        instances.gt_dp_u = u
        instances.gt_dp_v = v
        instances.gt_dp_vertex = vert
        instances.gt_dp_mesh_id = mesh_id
        dataset_dict["instances"] = utils.filter_empty_instances(instances)


class DensePoseBatchCollator(PaddedBatchCollator):
    """PaddedBatchCollator that also stacks the per-instance dp point arrays
    into [B, max_gt, P, ...] batch targets."""

    def __call__(self, batch_list: List[dict]) -> Dict[str, Any]:
        out = super().__call__(batch_list)
        # field presence must be decided per SAMPLE, not from batch_list[0]:
        # a bootstrap-mixed batch interleaves gt-mapper samples (which carry
        # gt_dp_vertex/gt_dp_mesh_id even for chart data) with pseudo-label
        # samples that may lack them — missing fields pad with the same
        # sentinels the losses mask on (-1), keeping the batch shape static
        # whatever the gt/pseudo draw is
        with_pts = [
            d["instances"]
            for d in batch_list
            if "instances" in d and hasattr(d["instances"], "gt_dp_points")
        ]
        if not with_pts:
            return out
        B = len(batch_list)
        G = self.max_gt_instances
        P = max(inst.gt_dp_points.shape[1] for inst in with_pts)
        pts = np.zeros((B, G, P, 2), np.float32)
        part = np.full((B, G, P), -1, np.int64)
        u = np.zeros((B, G, P), np.float32)
        v = np.zeros((B, G, P), np.float32)
        vert = np.full((B, G, P), -1, np.int64)
        mesh_id = np.full((B, G), -1, np.int64)
        has_cse = any(hasattr(inst, "gt_dp_vertex") for inst in with_pts)
        for i, d in enumerate(batch_list):
            inst = d.get("instances")
            if inst is None or not hasattr(inst, "gt_dp_points"):
                continue
            g = min(len(inst), G)
            if g:
                p = inst.gt_dp_points.shape[1]
                pts[i, :g, :p] = inst.gt_dp_points[:g]
                part[i, :g, :p] = inst.gt_dp_part[:g]
                u[i, :g, :p] = inst.gt_dp_u[:g]
                v[i, :g, :p] = inst.gt_dp_v[:g]
                if has_cse and hasattr(inst, "gt_dp_vertex"):
                    vert[i, :g, :p] = inst.gt_dp_vertex[:g]
                    mesh_id[i, :g] = inst.gt_dp_mesh_id[:g]
        out["gt_dp_points"] = pts
        out["gt_dp_part"] = part
        out["gt_dp_u"] = u
        out["gt_dp_v"] = v
        if has_cse:
            out["gt_dp_vertex"] = vert
            out["gt_dp_mesh_id"] = mesh_id
        return out


_DENSEPOSE_SPLITS = {
    # name -> (images_root, annotations json) under $DETECTRON2_DATASETS
    # (reference densepose/data/datasets/coco.py:35-80)
    "densepose_coco_2014_train": ("coco/train2014", "coco/annotations/densepose_train2014.json"),
    "densepose_coco_2014_minival": (
        "coco/val2014",
        "coco/annotations/densepose_minival2014.json",
    ),
    "densepose_coco_2014_minival_100": (
        "coco/val2014",
        "coco/annotations/densepose_minival2014_100.json",
    ),
    "densepose_coco_2014_valminusminival": (
        "coco/val2014",
        "coco/annotations/densepose_valminusminival2014.json",
    ),
    # chart-annotated DensePose-Chimps (reference coco.py:76-80)
    "densepose_chimps": (
        "densepose_chimps/images",
        "densepose_chimps/densepose_chimps_densepose.json",
    ),
}

# CSE re-annotations (vertex ids on the SMPL mesh instead of IUV charts;
# reference densepose/data/datasets/coco.py DENSEPOSE_CSE_KEYS_WITHOUT_MASK)
_DENSEPOSE_CSE_SPLITS = {
    "densepose_coco_2014_train_cse": (
        "coco/train2014",
        "coco/annotations/densepose_train2014_cse.json",
    ),
    "densepose_coco_2014_minival_cse": (
        "coco/val2014",
        "coco/annotations/densepose_minival2014_cse.json",
    ),
    "densepose_coco_2014_minival_100_cse": (
        "coco/val2014",
        "coco/annotations/densepose_minival2014_100_cse.json",
    ),
    "densepose_coco_2014_valminusminival_cse": (
        "coco/val2014",
        "coco/annotations/densepose_valminusminival2014_cse.json",
    ),
    # DensePose-Chimps (reference densepose/data/datasets/coco.py:81-90)
    "densepose_chimps_cse_train": (
        "densepose_chimps/images",
        "densepose_chimps/densepose_chimps_cse_train.json",
    ),
    "densepose_chimps_cse_val": (
        "densepose_chimps/images",
        "densepose_chimps/densepose_chimps_cse_val.json",
    ),
}

DENSEPOSE_ANN_KEYS = ["dp_x", "dp_y", "dp_I", "dp_U", "dp_V", "dp_masks"]
DENSEPOSE_CSE_ANN_KEYS = ["dp_x", "dp_y", "dp_vertex", "ref_model", "dp_masks"]


def register_densepose_coco(root: Optional[str] = None):
    """Register the DensePose-COCO splits in the catalogs
    (reference densepose/data/datasets/coco.py:256-285)."""
    import os

    from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_tpu.data.datasets.coco import load_coco_json

    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    all_splits = dict(_DENSEPOSE_SPLITS)
    all_splits.update(_DENSEPOSE_CSE_SPLITS)
    for name, (image_root, json_file) in all_splits.items():
        if name in DatasetCatalog:
            continue
        keys = DENSEPOSE_CSE_ANN_KEYS if name.endswith("_cse") else DENSEPOSE_ANN_KEYS
        image_dir = os.path.join(root, image_root)
        json_path = os.path.join(root, json_file)
        DatasetCatalog.register(
            name,
            (lambda j=json_path, d=image_dir, n=name, k=keys: load_coco_json(
                j, d, n, extra_annotation_keys=k
            )),
        )
        MetadataCatalog.get(name).set(
            json_file=json_path,
            image_root=image_dir,
            evaluator_type="densepose_coco",
            thing_classes=["person"],
        )
