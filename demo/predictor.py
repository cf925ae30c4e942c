"""Visualization demo helpers (reference demo/predictor.py).

The reference's AsyncPredictor spawns one worker process per GPU; with jax's
async dispatch a single process already pipelines host preprocessing with
device compute, so VisualizationDemo drives DefaultPredictor directly.
"""

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.engine.defaults import DefaultPredictor
from detectron2_tpu.utils.visualizer import ColorMode, Visualizer


class VisualizationDemo:
    def __init__(self, cfg, instance_mode=ColorMode.IMAGE):
        self.metadata = MetadataCatalog.get(
            cfg.DATASETS.TEST[0] if len(cfg.DATASETS.TEST) else "__unused"
        )
        self.instance_mode = instance_mode
        self.predictor = DefaultPredictor(cfg)

    def run_on_image(self, image: np.ndarray):
        """
        Args:
            image: BGR HWC uint8.

        Returns:
            (predictions dict, VisImage)
        """
        predictions = self.predictor(image)
        # visualizer expects RGB
        image_rgb = image[:, :, ::-1]
        visualizer = Visualizer(image_rgb, self.metadata, instance_mode=self.instance_mode)
        vis_output = None
        if "panoptic_seg" in predictions:
            panoptic_seg, segments_info = predictions["panoptic_seg"]
            vis_output = visualizer.draw_panoptic_seg(np.asarray(panoptic_seg), segments_info)
        elif "sem_seg" in predictions:
            vis_output = visualizer.draw_sem_seg(np.asarray(predictions["sem_seg"]).argmax(axis=-1))
        elif "instances" in predictions:
            vis_output = visualizer.draw_instance_predictions(predictions["instances"].numpy())
        return predictions, vis_output

    def run_on_video(self, video):
        """Yields (frame_predictions, vis_frame) over a cv2.VideoCapture."""
        import cv2

        from detectron2_tpu.utils.video_visualizer import VideoVisualizer

        video_visualizer = VideoVisualizer(self.metadata, self.instance_mode)
        while video.isOpened():
            success, frame = video.read()
            if not success:
                break
            predictions = self.predictor(frame)
            frame_rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if "instances" in predictions:
                vis_frame = video_visualizer.draw_instance_predictions(
                    frame_rgb, predictions["instances"].numpy()
                )
            else:
                vis_frame = Visualizer(frame_rgb, self.metadata).output
            vis_frame = cv2.cvtColor(vis_frame.get_image(), cv2.COLOR_RGB2BGR)
            yield predictions, vis_frame
