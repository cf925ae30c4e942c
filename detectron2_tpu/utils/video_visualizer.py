"""Video visualization with temporally consistent colors
(reference detectron2/utils/video_visualizer.py)."""

from typing import List

import numpy as np

from detectron2_tpu.structures.boxes import pairwise_iou
from detectron2_tpu.utils.visualizer import ColorMode, Visualizer, _create_text_labels, random_color

__all__ = ["VideoVisualizer"]


class _DetectedInstance:
    __slots__ = ["label", "bbox", "color", "ttl"]

    def __init__(self, label, bbox, color, ttl):
        self.label = label
        self.bbox = bbox
        self.color = color
        self.ttl = ttl


class VideoVisualizer:
    def __init__(self, metadata, instance_mode=ColorMode.IMAGE):
        self.metadata = metadata
        self._old_instances: List[_DetectedInstance] = []
        self._instance_mode = instance_mode

    def draw_instance_predictions(self, frame: np.ndarray, predictions):
        frame_visualizer = Visualizer(frame, self.metadata)
        num_instances = len(predictions)
        if num_instances == 0:
            return frame_visualizer.output

        boxes = np.asarray(predictions.pred_boxes.tensor) if predictions.has("pred_boxes") else None
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = np.asarray(predictions.pred_classes) if predictions.has("pred_classes") else None

        detected = [
            _DetectedInstance(int(classes[i]), boxes[i], color=None, ttl=8)
            for i in range(num_instances)
        ]
        colors = self._assign_colors(detected)
        labels = _create_text_labels(classes.tolist(), scores, self.metadata.get("thing_classes", None))

        frame_visualizer.overlay_instances(boxes=boxes, labels=labels, assigned_colors=colors, alpha=0.5)
        return frame_visualizer.output

    def _assign_colors(self, instances: List[_DetectedInstance]):
        """Track by bbox IoU and reuse colors for the same object
        (reference video_visualizer.py:180-240)."""
        for inst in self._old_instances:
            inst.ttl -= 1

        if instances and self._old_instances:
            from detectron2_tpu.structures import Boxes

            boxes_old = Boxes(np.asarray([x.bbox for x in self._old_instances], np.float32))
            boxes_new = Boxes(np.asarray([x.bbox for x in instances], np.float32))
            # np.array (copy): asarray of a jax array is a READ-ONLY view and
            # the matching loop zeroes claimed columns in place
            ious = np.array(pairwise_iou(boxes_old, boxes_new))
            threshold = 0.6
            if ious.size:
                for old_idx, old in enumerate(self._old_instances):
                    new_idx = int(ious[old_idx].argmax())
                    if ious[old_idx, new_idx] > threshold and instances[new_idx].color is None:
                        if old.label == instances[new_idx].label:
                            instances[new_idx].color = old.color
                            ious[:, new_idx] = 0

        extra = []
        for inst in instances:
            if inst.color is None:
                inst.color = random_color(rgb=True, maximum=1)
        for old in self._old_instances:
            if old.ttl > 0:
                extra.append(old)
        self._old_instances = instances[:] + extra
        return [d.color for d in instances]
