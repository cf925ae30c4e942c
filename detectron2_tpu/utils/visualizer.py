"""Visualization of predictions and dataset annotations
(reference detectron2/utils/visualizer.py:331-1200), matplotlib-based.

A compact re-implementation of the Visualizer API surface used by demo.py and
VIS_PERIOD training visualization: draw_instance_predictions, draw_dataset_dict,
draw_sem_seg, draw_panoptic_seg, plus box/mask/text primitives.
"""

import colorsys
from typing import Any, List, Optional, Tuple

import numpy as np

__all__ = ["ColorMode", "VisImage", "Visualizer", "GenericMask", "random_color"]

_SMALL_OBJECT_AREA_THRESH = 1000

# A compact categorical palette (fraction-of-255 RGB).
_COLORS = (
    np.array(
        [
            [0.000, 0.447, 0.741], [0.850, 0.325, 0.098], [0.929, 0.694, 0.125],
            [0.494, 0.184, 0.556], [0.466, 0.674, 0.188], [0.301, 0.745, 0.933],
            [0.635, 0.078, 0.184], [0.300, 0.300, 0.300], [0.600, 0.600, 0.600],
            [1.000, 0.000, 0.000], [1.000, 0.500, 0.000], [0.749, 0.749, 0.000],
            [0.000, 1.000, 0.000], [0.000, 0.000, 1.000], [0.667, 0.000, 1.000],
            [0.333, 0.333, 0.000], [0.333, 0.667, 0.000], [0.333, 1.000, 0.000],
            [0.667, 0.333, 0.000], [0.667, 0.667, 0.000], [0.667, 1.000, 0.000],
            [1.000, 0.333, 0.000], [1.000, 0.667, 0.000], [1.000, 1.000, 0.000],
        ]
    )
    .astype(np.float32)
    .reshape(-1, 3)
)


def random_color(rgb=False, maximum=255):
    idx = np.random.randint(0, len(_COLORS))
    ret = _COLORS[idx] * maximum
    if not rgb:
        ret = ret[::-1]
    return ret


class ColorMode:
    IMAGE = 0
    SEGMENTATION = 1
    IMAGE_BW = 2


class GenericMask:
    """Attribute conversions between mask representations: full bitmask,
    polygons, RLE (reference visualizer.py:59-160)."""

    def __init__(self, mask_or_polygons, height: int, width: int):
        self._mask = self._polygons = None
        self.height = height
        self.width = width

        m = mask_or_polygons
        if isinstance(m, dict):
            from detectron2_tpu.evaluation.rle import rle_to_mask

            self._mask = rle_to_mask(m).astype(np.uint8)
        elif isinstance(m, list):
            self._polygons = [np.asarray(x).reshape(-1) for x in m]
        elif isinstance(m, np.ndarray):
            assert m.shape[1] != 2, m.shape
            assert m.shape == (height, width), f"mask shape: {m.shape}, target dims: {height}, {width}"
            self._mask = m.astype(np.uint8)
        else:
            self._mask = np.asarray(m).astype(np.uint8)

    @property
    def mask(self):
        if self._mask is None:
            from detectron2_tpu.evaluation.rle import polygons_to_mask

            self._mask = polygons_to_mask(self._polygons, self.height, self.width)
        return self._mask

    @property
    def polygons(self):
        if self._polygons is None:
            self._polygons = self._mask_to_polygons(self._mask)[0]
        return self._polygons

    def _mask_to_polygons(self, mask):
        import cv2

        mask = np.ascontiguousarray(mask)
        res = cv2.findContours(mask.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
        hierarchy = res[-1]
        if hierarchy is None:
            return [], False
        has_holes = (hierarchy.reshape(-1, 4)[:, 3] >= 0).sum() > 0
        res = res[-2]
        res = [x.flatten() for x in res]
        res = [x + 0.5 for x in res if len(x) >= 6]
        return res, has_holes

    def area(self):
        return self.mask.sum()

    def bbox(self):
        ys, xs = np.nonzero(self.mask)
        if len(xs) == 0:
            return np.zeros(4)
        return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])


class VisImage:
    def __init__(self, img: np.ndarray, scale: float = 1.0):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.figure as mplfigure
        from matplotlib.backends.backend_agg import FigureCanvasAgg

        self.img = img
        self.scale = scale
        self.height, self.width = img.shape[:2]
        fig = mplfigure.Figure(frameon=False)
        self.dpi = fig.get_dpi()
        fig.set_size_inches(
            (self.width * scale + 1e-2) / self.dpi, (self.height * scale + 1e-2) / self.dpi
        )
        self.canvas = FigureCanvasAgg(fig)
        ax = fig.add_axes([0.0, 0.0, 1.0, 1.0])
        ax.axis("off")
        self.fig = fig
        self.ax = ax
        ax.imshow(img, extent=(0, self.width, self.height, 0), interpolation="nearest")

    def save(self, filepath: str) -> None:
        self.fig.savefig(filepath)

    def get_image(self) -> np.ndarray:
        canvas = self.canvas
        s, (width, height) = canvas.print_to_buffer()
        buffer = np.frombuffer(s, dtype="uint8")
        img_rgba = buffer.reshape(height, width, 4)
        rgb, _ = np.split(img_rgba, [3], axis=2)
        return rgb.astype("uint8")


class Visualizer:
    """Draw detection/segmentation results on an image
    (reference visualizer.py:331)."""

    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0, instance_mode=ColorMode.IMAGE):
        self.img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        if metadata is None:
            from detectron2_tpu.data.catalog import MetadataCatalog

            metadata = MetadataCatalog.get("__nonexist__")
        self.metadata = metadata
        self.output = VisImage(self.img, scale=scale)
        # too small texts are useless -> lower bound font size
        self._default_font_size = max(np.sqrt(self.output.height * self.output.width) // 90, 10 // scale)
        self._instance_mode = instance_mode

    # ------------------------------------------------------------ high-level
    def draw_instance_predictions(self, predictions) -> VisImage:
        """predictions: host Instances with pred_boxes/scores/pred_classes and
        optional pred_masks/pred_keypoints."""
        boxes = np.asarray(predictions.pred_boxes.tensor) if predictions.has("pred_boxes") else None
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = np.asarray(predictions.pred_classes).tolist() if predictions.has("pred_classes") else None
        labels = _create_text_labels(classes, scores, self.metadata.get("thing_classes", None))
        keypoints = np.asarray(predictions.pred_keypoints) if predictions.has("pred_keypoints") else None

        masks = None
        if predictions.has("pred_masks"):
            masks_np = np.asarray(predictions.pred_masks.tensor)
            masks = [GenericMask(m, self.output.height, self.output.width) for m in masks_np]

        colors = None
        if self._instance_mode == ColorMode.SEGMENTATION and self.metadata.get("thing_colors"):
            colors = [
                np.asarray(self.metadata.thing_colors[c]) / 255.0 for c in classes
            ]

        self.overlay_instances(
            boxes=boxes, masks=masks, labels=labels, keypoints=keypoints, assigned_colors=colors
        )
        return self.output

    def draw_dataset_dict(self, dic) -> VisImage:
        """Draw annotations of one dataset dict."""
        annos = dic.get("annotations", None)
        if annos:
            from detectron2_tpu.structures import BoxMode

            boxes = np.asarray(
                [
                    BoxMode.convert(x["bbox"], x["bbox_mode"], BoxMode.XYXY_ABS)
                    for x in annos
                ]
            )
            classes = [x["category_id"] for x in annos]
            names = self.metadata.get("thing_classes", None)
            labels = _create_text_labels(classes, None, names)
            masks = [x.get("segmentation") for x in annos]
            masks = [
                GenericMask(m, self.output.height, self.output.width) if m is not None else None
                for m in masks
            ]
            if all(m is None for m in masks):
                masks = None
            self.overlay_instances(boxes=boxes, labels=labels, masks=masks)
        return self.output

    def draw_sem_seg(self, sem_seg: np.ndarray, area_threshold=None, alpha=0.8) -> VisImage:
        labels, areas = np.unique(sem_seg, return_counts=True)
        sorted_idxs = np.argsort(-areas).tolist()
        labels = labels[sorted_idxs]
        stuff_classes = self.metadata.get("stuff_classes", None)
        for label in filter(lambda l: stuff_classes is None or l < len(stuff_classes), labels):
            binary_mask = (sem_seg == label).astype(np.uint8)
            text = stuff_classes[label] if stuff_classes else str(label)
            self.draw_binary_mask(
                binary_mask,
                color=_COLORS[int(label) % len(_COLORS)],
                text=text,
                alpha=alpha,
                area_threshold=area_threshold,
            )
        return self.output

    def draw_panoptic_seg(self, panoptic_seg: np.ndarray, segments_info, area_threshold=None, alpha=0.7) -> VisImage:
        for info in segments_info:
            mask = (panoptic_seg == info["id"]).astype(np.uint8)
            if info.get("isthing", False):
                names = self.metadata.get("thing_classes", None)
            else:
                names = self.metadata.get("stuff_classes", None)
            text = names[info["category_id"]] if names else str(info["category_id"])
            self.draw_binary_mask(
                mask, color=_COLORS[info["category_id"] % len(_COLORS)], text=text, alpha=alpha,
                area_threshold=area_threshold,
            )
        return self.output

    # ------------------------------------------------------------- mid-level
    def overlay_instances(self, *, boxes=None, labels=None, masks=None, keypoints=None, assigned_colors=None, alpha=0.5) -> VisImage:
        num_instances = 0
        if boxes is not None:
            num_instances = len(boxes)
        if masks is not None:
            num_instances = max(num_instances, len(masks))
        if labels is not None and num_instances == 0:
            num_instances = len(labels)
        if num_instances == 0:
            return self.output

        if assigned_colors is None:
            assigned_colors = [random_color(rgb=True, maximum=1) for _ in range(num_instances)]

        # display in descending order of area
        if boxes is not None and len(boxes):
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            sorted_idxs = np.argsort(-areas).tolist()
            boxes = boxes[sorted_idxs]
            labels = [labels[k] for k in sorted_idxs] if labels is not None else None
            masks = [masks[idx] for idx in sorted_idxs] if masks is not None else None
            assigned_colors = [assigned_colors[idx] for idx in sorted_idxs]
            keypoints = keypoints[sorted_idxs] if keypoints is not None else None

        for i in range(num_instances):
            color = assigned_colors[i]
            if boxes is not None:
                self.draw_box(boxes[i], edge_color=color)
            if masks is not None and masks[i] is not None:
                for segment in masks[i].polygons:
                    self.draw_polygon(segment.reshape(-1, 2), color, alpha=alpha)
            if labels is not None:
                if boxes is not None:
                    x0, y0, x1, y1 = boxes[i]
                    text_pos = (x0, y0)
                elif masks is not None and masks[i] is not None:
                    x0, y0, x1, y1 = masks[i].bbox()
                    text_pos = (x0, y0)
                else:
                    continue
                self.draw_text(labels[i], text_pos, color=tuple(np.minimum(np.asarray(color) * 1.2, 1.0)))
            if keypoints is not None:
                self.draw_keypoints(keypoints[i])
        return self.output

    # ------------------------------------------------------------ primitives
    def draw_box(self, box_coord, alpha=0.5, edge_color="g", line_style="-") -> VisImage:
        import matplotlib as mpl

        x0, y0, x1, y1 = box_coord
        width = x1 - x0
        height = y1 - y0
        linewidth = max(self._default_font_size / 4, 1)
        self.output.ax.add_patch(
            mpl.patches.Rectangle(
                (x0, y0),
                width,
                height,
                fill=False,
                edgecolor=edge_color,
                linewidth=linewidth * self.output.scale,
                alpha=alpha,
                linestyle=line_style,
            )
        )
        return self.output

    def draw_text(self, text, position, *, font_size=None, color="g", horizontal_alignment="left", rotation=0) -> VisImage:
        if not font_size:
            font_size = self._default_font_size
        x, y = position
        self.output.ax.text(
            x,
            y,
            text,
            size=font_size * self.output.scale,
            family="sans-serif",
            bbox={"facecolor": "black", "alpha": 0.8, "pad": 0.7, "edgecolor": "none"},
            verticalalignment="top",
            horizontalalignment=horizontal_alignment,
            color=color,
            zorder=10,
            rotation=rotation,
        )
        return self.output

    def draw_polygon(self, segment, color, edge_color=None, alpha=0.5) -> VisImage:
        import matplotlib as mpl

        if edge_color is None:
            edge_color = color
        polygon = mpl.patches.Polygon(
            segment,
            fill=True,
            facecolor=tuple(list(np.asarray(color)) + [alpha]),
            edgecolor=tuple(list(np.asarray(edge_color)) + [1]),
            linewidth=max(self._default_font_size // 15 * self.output.scale, 1),
        )
        self.output.ax.add_patch(polygon)
        return self.output

    def draw_binary_mask(self, binary_mask, color=None, *, edge_color=None, text=None, alpha=0.5, area_threshold=10) -> VisImage:
        if color is None:
            color = random_color(rgb=True, maximum=1)
        mask = GenericMask(binary_mask.astype(np.uint8), self.output.height, self.output.width)
        area_threshold = area_threshold or 10
        for segment in mask.polygons:
            seg = segment.reshape(-1, 2)
            self.draw_polygon(seg, color=color, edge_color=edge_color, alpha=alpha)
        if text is not None and mask.area() > area_threshold:
            ys, xs = np.nonzero(mask.mask)
            self.draw_text(text, (xs.mean(), ys.mean()), color=tuple(np.minimum(np.asarray(color) * 1.2, 1.0)))
        return self.output

    def draw_circle(self, circle_coord, color, radius=3) -> VisImage:
        import matplotlib as mpl

        x, y = circle_coord
        self.output.ax.add_patch(mpl.patches.Circle(circle_coord, radius=radius, fill=True, color=color))
        return self.output

    def draw_line(self, x_data, y_data, color, linestyle="-", linewidth=None) -> VisImage:
        import matplotlib as mpl

        if linewidth is None:
            linewidth = self._default_font_size / 3
        self.output.ax.add_line(
            mpl.lines.Line2D(
                x_data, y_data, linewidth=linewidth * self.output.scale, color=color, linestyle=linestyle
            )
        )
        return self.output

    def draw_keypoints(self, keypoints) -> VisImage:
        """keypoints: [K, >=2] array (x, y, ...)."""
        rules = self.metadata.get("keypoint_connection_rules", None)
        names = self.metadata.get("keypoint_names", None)
        visible = {}
        for idx, kpt in enumerate(np.asarray(keypoints)):
            x, y = float(kpt[0]), float(kpt[1])
            self.draw_circle((x, y), color=(1.0, 0.0, 0.0))
            if names:
                visible[names[idx]] = (x, y)
        if rules and names:
            for (kp1, kp2, color) in rules:
                if kp1 in visible and kp2 in visible:
                    x0, y0 = visible[kp1]
                    x1, y1 = visible[kp2]
                    self.draw_line([x0, x1], [y0, y1], color=np.asarray(color) / 255.0)
        return self.output

    def get_output(self) -> VisImage:
        return self.output


def _create_text_labels(classes, scores, class_names) -> Optional[List[str]]:
    labels = None
    if classes is not None:
        if class_names is not None and len(class_names) > 0:
            labels = [class_names[i] for i in classes]
        else:
            labels = [str(i) for i in classes]
    if scores is not None:
        if labels is None:
            labels = ["{:.0f}%".format(s * 100) for s in scores]
        else:
            labels = ["{} {:.0f}%".format(l, s * 100) for l, s in zip(labels, scores)]
    return labels
