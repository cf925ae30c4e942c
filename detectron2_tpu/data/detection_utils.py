"""Common data processing utilities for detection datasets
(reference detectron2/data/detection_utils.py), plus the TPU-specific
padded-target packing (`instances_to_padded_targets`) that turns per-image
dynamic annotations into the fixed-shape arrays the compiled step consumes.
"""

import logging
from typing import Dict, List, Optional

import numpy as np

from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.structures import (
    BitMasks,
    Boxes,
    BoxMode,
    Instances,
    Keypoints,
    PolygonMasks,
    RotatedBoxes,
    polygons_to_bitmask,
)

__all__ = [
    "SizeMismatchError",
    "convert_image_to_rgb",
    "check_image_size",
    "transform_proposals",
    "transform_instance_annotations",
    "annotations_to_instances",
    "annotations_to_instances_rotated",
    "build_augmentation",
    "create_keypoint_hflip_indices",
    "filter_empty_instances",
    "read_image",
    "instances_to_padded_targets",
]


class SizeMismatchError(ValueError):
    """When the loaded image has a different width/height than the annotation."""


# COCO-standard conversion matrices kept for YUV-BT.601 support
_M_RGB2YUV = [[0.299, 0.587, 0.114], [-0.14713, -0.28886, 0.436], [0.615, -0.51499, -0.10001]]
_M_YUV2RGB = [[1.0, 0.0, 1.13983], [1.0, -0.39465, -0.58060], [1.0, 2.03211, 0.0]]


def convert_PIL_to_numpy(image, format: Optional[str]) -> np.ndarray:
    """PIL image -> numpy in the given format (reference detection_utils.py:60)."""
    if format is not None:
        conversion_format = format
        if format in ["BGR", "YUV-BT.601"]:
            conversion_format = "RGB"
        image = image.convert(conversion_format)
    image = np.asarray(image)
    if format == "L":
        image = np.expand_dims(image, -1)
    elif format == "BGR":
        image = image[:, :, ::-1]
    elif format == "YUV-BT.601":
        image = image / 255.0
        image = np.dot(image, np.array(_M_RGB2YUV).T)
    return image


def convert_image_to_rgb(image: np.ndarray, format: str) -> np.ndarray:
    """Convert an image from the given format to RGB (reference :89)."""
    image = np.asarray(image)
    if format == "BGR":
        image = image[:, :, [2, 1, 0]]
    elif format == "YUV-BT.601":
        image = np.dot(image, np.array(_M_YUV2RGB).T)
        image = image * 255.0
    elif format == "L":
        image = image[:, :, 0]
    image = image.astype(np.uint8)
    return image


def read_image(file_name: str, format: Optional[str] = None) -> np.ndarray:
    """Read an image into the given format, applying EXIF orientation
    (reference detection_utils.py:119-189)."""
    from PIL import Image, ImageOps

    from detectron2_tpu.utils.file_io import PathManager

    with PathManager.open(file_name, "rb") as f:
        image = Image.open(f)
        try:
            image = ImageOps.exif_transpose(image)
        except Exception:
            pass
        return convert_PIL_to_numpy(image, format)


def check_image_size(dataset_dict: dict, image: np.ndarray) -> None:
    """Raise if the loaded image mismatches the annotated width/height."""
    if "width" in dataset_dict or "height" in dataset_dict:
        image_wh = (image.shape[1], image.shape[0])
        expected_wh = (dataset_dict["width"], dataset_dict["height"])
        if not image_wh == expected_wh:
            raise SizeMismatchError(
                "Mismatched image shape{}, got {}, expect {}.".format(
                    " for image " + dataset_dict["file_name"] if "file_name" in dataset_dict else "",
                    image_wh,
                    expected_wh,
                )
            )
    if "width" not in dataset_dict:
        dataset_dict["width"] = image.shape[1]
    if "height" not in dataset_dict:
        dataset_dict["height"] = image.shape[0]


def transform_proposals(dataset_dict, image_shape, transforms, *, proposal_topk, min_box_size=0):
    """Apply transformations to precomputed proposals in dataset_dict
    (reference :219-270)."""
    if "proposal_boxes" not in dataset_dict:
        return
    boxes = BoxMode.convert(
        np.asarray(dataset_dict.pop("proposal_boxes")),
        dataset_dict.pop("proposal_bbox_mode"),
        BoxMode.XYXY_ABS,
    )
    boxes = transforms.apply_box(boxes)
    boxes = Boxes(np.asarray(boxes, np.float32))
    objectness_logits = np.asarray(dataset_dict.pop("proposal_objectness_logits"))

    boxes.clip(image_shape)
    keep = np.asarray(boxes.nonempty(threshold=min_box_size))
    boxes = boxes[keep]
    objectness_logits = objectness_logits[keep]

    proposals = Instances(image_shape)
    proposals.proposal_boxes = boxes[:proposal_topk]
    proposals.objectness_logits = objectness_logits[:proposal_topk]
    dataset_dict["proposals"] = proposals


def transform_instance_annotations(annotation, transforms, image_size, *, keypoint_hflip_indices=None):
    """Apply transforms to the bbox/segmentation/keypoints of one annotation
    (reference :273-335)."""
    if isinstance(transforms, (tuple, list)):
        transforms = T.TransformList(transforms)
    bbox = BoxMode.convert(annotation["bbox"], annotation["bbox_mode"], BoxMode.XYXY_ABS)
    bbox = transforms.apply_box(np.array([bbox]))[0]
    bbox = np.minimum(bbox, np.array(list(image_size + image_size))[::-1].astype(np.float64))
    bbox = np.maximum(bbox, 0)
    annotation["bbox"] = bbox
    annotation["bbox_mode"] = BoxMode.XYXY_ABS

    if "segmentation" in annotation:
        segm = annotation["segmentation"]
        if isinstance(segm, list):
            polygons = [np.asarray(p).reshape(-1, 2) for p in segm]
            annotation["segmentation"] = [p.reshape(-1) for p in transforms.apply_polygons(polygons)]
        elif isinstance(segm, dict):
            from detectron2_tpu.evaluation.rle import rle_to_mask

            mask = rle_to_mask(segm) if "counts" in segm else segm
            mask = transforms.apply_segmentation(mask.astype(np.uint8))
            annotation["segmentation"] = mask.astype(bool)
        elif isinstance(segm, np.ndarray):
            annotation["segmentation"] = transforms.apply_segmentation(segm)
        else:
            raise ValueError(
                "Cannot transform segmentation of type '{}'!"
                "Supported types are: polygons as list[list[float] or ndarray],"
                " COCO-style RLE as a dict, or a binary segmentation mask "
                " in a 2D numpy array of shape HxW.".format(type(segm))
            )

    if "keypoints" in annotation:
        keypoints = transform_keypoint_annotations(
            annotation["keypoints"], transforms, image_size, keypoint_hflip_indices
        )
        annotation["keypoints"] = keypoints

    return annotation


def transform_keypoint_annotations(keypoints, transforms, image_size, keypoint_hflip_indices=None):
    """Transform keypoints; horizontal flips swap left/right keypoints
    (reference :337-383)."""
    if isinstance(transforms, (tuple, list)):
        transforms = T.TransformList(transforms)
    keypoints = np.asarray(keypoints, dtype="float64").reshape(-1, 3)
    keypoints_xy = transforms.apply_coords(keypoints[:, :2])

    # hflip detection: odd number of hflips
    do_hflip = sum(isinstance(t, T.HFlipTransform) for t in getattr(transforms, "transforms", [])) % 2 == 1

    keypoints[:, :2] = keypoints_xy
    if do_hflip:
        if keypoint_hflip_indices is None:
            raise ValueError("Cannot flip keypoints without providing flip indices!")
        if len(keypoints) != len(keypoint_hflip_indices):
            raise ValueError(
                f"Keypoint data has {len(keypoints)} points, but metadata "
                f"contains {len(keypoint_hflip_indices)} points!"
            )
        keypoints = keypoints[np.asarray(keypoint_hflip_indices, dtype=np.int32), :]

    # set coordinates out of the image to "unlabeled"
    inside = (
        (keypoints[:, 0] >= 0)
        & (keypoints[:, 0] <= image_size[1])
        & (keypoints[:, 1] >= 0)
        & (keypoints[:, 1] <= image_size[0])
    )
    keypoints[:, 2] = np.where(inside, keypoints[:, 2], 0)
    keypoints[keypoints[:, 2] == 0] = 0
    return keypoints


def annotations_to_instances(annos, image_size, mask_format="polygon") -> Instances:
    """Create an :class:`Instances` object from annotation dicts
    (reference :385-460)."""
    boxes = (
        np.stack([BoxMode.convert(obj["bbox"], obj["bbox_mode"], BoxMode.XYXY_ABS) for obj in annos])
        if len(annos)
        else np.zeros((0, 4))
    )
    target = Instances(image_size)
    target.gt_boxes = Boxes(np.asarray(boxes, np.float32))

    classes = np.asarray([int(obj["category_id"]) for obj in annos], dtype=np.int64)
    target.gt_classes = classes

    if len(annos) and "segmentation" in annos[0]:
        segms = [obj["segmentation"] for obj in annos]
        if mask_format == "polygon":
            try:
                masks = PolygonMasks(segms)
            except ValueError as e:
                raise ValueError(
                    "Failed to use mask_format=='polygon' from the given annotations!"
                ) from e
        else:
            assert mask_format == "bitmask", mask_format
            masks = []
            for segm in segms:
                if isinstance(segm, list):
                    masks.append(polygons_to_bitmask(segm, *image_size))
                elif isinstance(segm, dict):
                    from detectron2_tpu.evaluation.rle import rle_to_mask

                    masks.append(rle_to_mask(segm))
                elif isinstance(segm, np.ndarray):
                    assert segm.ndim == 2, f"Expect segmentation of 2 dimensions, got {segm.ndim}."
                    masks.append(segm.astype(bool))
                else:
                    raise ValueError(f"Unsupported segmentation type {type(segm)}")
            masks = BitMasks(
                np.stack(masks) if len(masks) else np.zeros((0,) + tuple(image_size), bool)
            )
        target.gt_masks = masks

    if len(annos) and "keypoints" in annos[0]:
        kpts = [obj.get("keypoints", []) for obj in annos]
        target.gt_keypoints = Keypoints(np.asarray(kpts, np.float32).reshape(len(annos), -1, 3))

    return target


def annotations_to_instances_rotated(annos, image_size) -> Instances:
    """Rotated-box variant (reference :463-486)."""
    boxes = [obj["bbox"] for obj in annos]
    target = Instances(image_size)
    target.gt_boxes = RotatedBoxes(
        np.asarray(boxes, np.float32) if len(boxes) else np.zeros((0, 5), np.float32)
    )
    classes = np.asarray([int(obj["category_id"]) for obj in annos], dtype=np.int64)
    target.gt_classes = classes
    return target


def filter_empty_instances(instances: Instances, by_box=True, by_mask=True, box_threshold=1e-5, return_mask=False):
    """Filter out empty instances (reference :489-522)."""
    assert by_box or by_mask
    r = []
    if by_box:
        r.append(np.asarray(instances.gt_boxes.nonempty(threshold=box_threshold)))
    if instances.has("gt_masks") and by_mask:
        r.append(np.asarray(instances.gt_masks.nonempty()))

    if not r:
        return instances
    m = r[0]
    for x in r[1:]:
        m = m & x
    if return_mask:
        return instances[m], m
    return instances[m]


def create_keypoint_hflip_indices(dataset_names) -> np.ndarray:
    """Per-keypoint index after a horizontal flip (reference :525-548)."""
    if isinstance(dataset_names, str):
        dataset_names = [dataset_names]

    check_metadata_consistency("keypoint_names", dataset_names)
    check_metadata_consistency("keypoint_flip_map", dataset_names)

    meta = MetadataCatalog.get(dataset_names[0])
    names = meta.keypoint_names
    flip_map = dict(meta.keypoint_flip_map)
    flip_map.update({v: k for k, v in flip_map.items()})
    flipped_names = [i if i not in flip_map else flip_map[i] for i in names]
    return np.asarray([names.index(i) for i in flipped_names])


def get_fed_loss_cls_weights(dataset_names, freq_weight_power=1.0) -> np.ndarray:
    """Per-class frequency weights for federated loss (reference :550-577)."""
    if isinstance(dataset_names, str):
        dataset_names = [dataset_names]
    check_metadata_consistency("class_image_count", dataset_names)
    meta = MetadataCatalog.get(dataset_names[0])
    class_freq_meta = meta.class_image_count
    class_freq = np.asarray(
        [c["image_count"] for c in sorted(class_freq_meta, key=lambda x: x["id"])], np.float32
    )
    return class_freq**freq_weight_power


def check_metadata_consistency(key, dataset_names):
    """Check that the datasets have consistent metadata (reference :602-630)."""
    if len(dataset_names) == 0:
        return
    logger = logging.getLogger(__name__)
    entries_per_dataset = [MetadataCatalog.get(d).get(key) for d in dataset_names]
    for idx, entry in enumerate(entries_per_dataset):
        if entry != entries_per_dataset[0]:
            logger.error(f"Metadata '{key}' for dataset '{dataset_names[idx]}' is '{entry}'")
            logger.error(f"Metadata '{key}' for dataset '{dataset_names[0]}' is '{entries_per_dataset[0]}'")
            raise ValueError(f"Datasets have different metadata '{key}'!")


def build_augmentation(cfg, is_train: bool) -> List[T.Augmentation]:
    """Default train/test augmentation from config (reference :632-655)."""
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        sample_style = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        sample_style = "choice"
    augmentation = [T.ResizeShortestEdge(min_size, max_size, sample_style)]
    if is_train and cfg.INPUT.RANDOM_FLIP != "none":
        augmentation.append(
            T.RandomFlip(
                horizontal=cfg.INPUT.RANDOM_FLIP == "horizontal",
                vertical=cfg.INPUT.RANDOM_FLIP == "vertical",
            )
        )
    return augmentation


build_transform_gen = build_augmentation


# --------------------------------------------------------------------------- #
# TPU padded-target packing
# --------------------------------------------------------------------------- #
def instances_to_padded_targets(
    instances: Instances,
    max_instances: int,
    mask_size: int = 0,
    num_keypoints: int = 0,
) -> Dict[str, np.ndarray]:
    """Convert a host Instances of GT into the fixed-shape target arrays the
    compiled step consumes (SURVEY.md §7.1: padded arrays + validity mask).

    - boxes/classes padded to ``max_instances`` with a validity mask;
    - masks: each instance's mask is rasterized *within its own gt box* at
      ``mask_size`` x ``mask_size`` (the device resamples these per proposal);
    - keypoints: padded [G, K, 3].
    """
    G = max_instances
    n = min(len(instances) if instances.get_fields() else 0, G)

    out: Dict[str, np.ndarray] = {
        "gt_boxes": np.zeros((G, 4), np.float32),
        "gt_classes": np.zeros((G,), np.int32),
        "gt_valid": np.zeros((G,), bool),
    }
    if n > 0:
        boxes = np.asarray(instances.gt_boxes.tensor, np.float32)[:n]
        out["gt_boxes"][:n] = boxes
        out["gt_classes"][:n] = np.asarray(instances.gt_classes)[:n]
        out["gt_valid"][:n] = True

    if mask_size > 0:
        out["gt_masks"] = np.zeros((G, mask_size, mask_size), np.float32)
        if n > 0 and instances.has("gt_masks"):
            gt_masks = instances.gt_masks
            boxes = out["gt_boxes"][:n]
            crops = np.asarray(gt_masks[list(range(n))].crop_and_resize(boxes, mask_size))
            out["gt_masks"][:n] = crops.astype(np.float32)

    if num_keypoints > 0:
        out["gt_keypoints"] = np.zeros((G, num_keypoints, 3), np.float32)
        if n > 0 and instances.has("gt_keypoints"):
            out["gt_keypoints"][:n] = np.asarray(instances.gt_keypoints.tensor)[:n]

    return out
