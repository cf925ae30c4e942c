"""Demo predictors (reference demo/predictor.py:1-220).

``VisualizationDemo`` pairs a :class:`DefaultPredictor` with the
:class:`Visualizer` for images and (when OpenCV is available) videos.

``AsyncPredictor`` is re-thought for TPU: the reference spawns one process
per GPU (predictor.py:132-219); a TPU chip is owned by a single process, so
overlap comes from pipelining host work (decode/resize/visualize) against
device compute with a background thread + bounded queues, which keeps the
same put/get API.
"""

import atexit
import queue
import threading

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.engine.defaults import DefaultPredictor
from detectron2_tpu.utils.video_visualizer import VideoVisualizer
from detectron2_tpu.utils.visualizer import ColorMode, Visualizer


class VisualizationDemo:
    def __init__(self, cfg, instance_mode=ColorMode.IMAGE, parallel=False):
        """
        Args:
            cfg (CfgNode):
            instance_mode (ColorMode)
            parallel (bool): pipeline host pre/post-processing against device
                compute via AsyncPredictor.
        """
        self.metadata = MetadataCatalog.get(
            cfg.DATASETS.TEST[0] if len(cfg.DATASETS.TEST) else "__unused"
        )
        self.instance_mode = instance_mode
        self.parallel = parallel
        if parallel:
            self.predictor = AsyncPredictor(cfg)
        else:
            self.predictor = DefaultPredictor(cfg)

    def run_on_image(self, image):
        """
        Args:
            image: BGR uint8 HWC image (the OpenCV-convention input the
                reference demo uses).
        Returns:
            (predictions dict, VisImage)
        """
        predictions = self.predictor(image)
        visualizer = Visualizer(image[:, :, ::-1], self.metadata, instance_mode=self.instance_mode)
        vis_output = None
        if "panoptic_seg" in predictions:
            panoptic_seg, segments_info = predictions["panoptic_seg"]
            vis_output = visualizer.draw_panoptic_seg(np.asarray(panoptic_seg), segments_info)
        elif "sem_seg" in predictions:
            vis_output = visualizer.draw_sem_seg(np.asarray(predictions["sem_seg"]).argmax(-1))
        if "instances" in predictions:
            vis_output = visualizer.draw_instance_predictions(predictions["instances"].numpy())
        return predictions, vis_output

    def _frame_from_video(self, video):
        while video.isOpened():
            success, frame = video.read()
            if success:
                yield frame
            else:
                break

    def run_on_video(self, video):
        """Yield visualized BGR frames for an ``cv2.VideoCapture``."""
        import cv2

        video_visualizer = VideoVisualizer(self.metadata, self.instance_mode)

        def process(frame, predictions):
            frame_rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if "instances" in predictions:
                vis = video_visualizer.draw_instance_predictions(frame_rgb, predictions["instances"])
            elif "sem_seg" in predictions:
                vis = video_visualizer.draw_sem_seg(
                    frame_rgb, np.asarray(predictions["sem_seg"]).argmax(-1)
                )
            else:
                return frame
            return cv2.cvtColor(vis.get_image(), cv2.COLOR_RGB2BGR)

        frames = self._frame_from_video(video)
        if self.parallel:
            # keep the device busy: submit ahead, visualize behind
            buffer_size = self.predictor.default_buffer_size
            pending = []
            for frame in frames:
                pending.append(frame)
                self.predictor.put(frame)
                if len(pending) >= buffer_size:
                    yield process(pending.pop(0), self.predictor.get())
            while pending:
                yield process(pending.pop(0), self.predictor.get())
        else:
            for frame in frames:
                yield process(frame, self.predictor(frame))


class AsyncPredictor:
    """Pipelined predictor: a worker thread owns the device; callers enqueue
    frames and dequeue results in order. (TPU-native replacement for the
    reference's multi-GPU process pool, predictor.py:132-219.)"""

    def __init__(self, cfg, num_workers: int = 1):
        self._task_queue = queue.Queue(maxsize=num_workers * 3)
        self._result_queue = queue.Queue()
        self._predictor = DefaultPredictor(cfg)

        def _work():
            while True:
                item = self._task_queue.get()
                if item is None:
                    break
                idx, frame = item
                self._result_queue.put((idx, self._predictor(frame)))

        self._thread = threading.Thread(target=_work, daemon=True)
        self._thread.start()
        self._put_idx = 0
        self._get_idx = 0
        self._result_buffer = {}
        atexit.register(self.shutdown)

    @property
    def default_buffer_size(self) -> int:
        return 5

    def put(self, image):
        self._task_queue.put((self._put_idx, image))
        self._put_idx += 1

    def get(self):
        while self._get_idx not in self._result_buffer:
            idx, res = self._result_queue.get()
            self._result_buffer[idx] = res
        out = self._result_buffer.pop(self._get_idx)
        self._get_idx += 1
        return out

    def __call__(self, image):
        self.put(image)
        return self.get()

    def __len__(self):
        return self._put_idx - self._get_idx

    def shutdown(self):
        self._task_queue.put(None)
