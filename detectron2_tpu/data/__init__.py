from detectron2_tpu.data import transforms  # isort:skip
from detectron2_tpu.data.build import (
    PaddedBatchCollator,
    build_batch_data_loader,
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
    load_proposals_into_dataset,
    print_instances_class_histogram,
)
from detectron2_tpu.data.catalog import DatasetCatalog, Metadata, MetadataCatalog
from detectron2_tpu.data.common import (
    AspectRatioGroupedDataset,
    DatasetFromList,
    MapDataset,
    ToIterableDataset,
)
from detectron2_tpu.data.dataset_mapper import DatasetMapper

__all__ = [k for k in globals().keys() if not k.startswith("_")]

# ensure builtin datasets are registered on `import detectron2_tpu.data`
# (reference data/__init__.py:17 imports datasets/samplers the same way)
from detectron2_tpu.data import datasets, samplers  # isort:skip  # noqa: F401,E402
