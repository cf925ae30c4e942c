from detectron2_tpu.evaluation.cityscapes_evaluation import (
    CityscapesInstanceEvaluator,
    CityscapesSemSegEvaluator,
)
from detectron2_tpu.evaluation.coco_evaluation import COCOEvaluator, instances_to_coco_json
from detectron2_tpu.evaluation.fast_eval_api import COCOeval_opt
from detectron2_tpu.evaluation.evaluator import (
    DatasetEvaluator,
    DatasetEvaluators,
    inference_on_dataset,
)
from detectron2_tpu.evaluation.lvis_evaluation import LVISEvaluator
from detectron2_tpu.evaluation.panoptic_evaluation import COCOPanopticEvaluator
from detectron2_tpu.evaluation.pascal_voc_evaluation import PascalVOCDetectionEvaluator
from detectron2_tpu.evaluation.rotated_coco_evaluation import RotatedCOCOEvaluator
from detectron2_tpu.evaluation.sem_seg_evaluation import SemSegEvaluator
from detectron2_tpu.evaluation.testing import flatten_results_dict, print_csv_format, verify_results

__all__ = [k for k in globals().keys() if not k.startswith("_")]
