"""DensePose (reference projects/DensePose/densepose/): dense human surface
correspondence — per-pixel body-part index I and per-part (U, V) chart
coordinates, or a continuous surface embedding (CSE), predicted per person.

Components:
- chart baseline: DensePoseV1ConvXHead tower + DensePoseChartPredictor
  (*_lowres deconvs + bilinear interp2d) + the FPN Decoder, with
  point-supervised IUV losses (DensePose GT IS a sparse point set, ~100
  points/person, so the TPU formulation samples predicted maps at the
  annotated points — no dense rasterization);
- UV confidences: iid-isotropic / independent-anisotropic NLL losses with
  sigma/kappa prediction channels (confidences.py);
- CSE: per-mesh vertex embedders + softmax embedding loss + per-pixel
  embedding head (cse.py, DensePoseCSEHead);
- evaluation: GPS / GPSM AP with pluggable mesh geodesics (evaluation.py).

Batch contract (train), padded per instance with P point slots:
``gt_dp_points`` [B, G, P, 2] absolute xy, ``gt_dp_part`` [B, G, P] int in
[0, 24] (-1 pad), ``gt_dp_u`` / ``gt_dp_v`` [B, G, P] float in [0, 1];
CSE training additionally uses ``gt_dp_vertex`` [B, G, P] int (-1 pad).
"""

from detectron2_tpu.projects.densepose.config import add_densepose_config
from detectron2_tpu.projects.densepose.cse import (
    Embedder,
    VertexDirectEmbedder,
    VertexFeatureEmbedder,
    closest_vertices_from_embedding,
    cse_embedding_loss,
    normalize_embeddings,
    squared_euclidean_distance_matrix,
)
from detectron2_tpu.projects.densepose.confidences import (
    iid_isotropic_gaussian_uv_loss,
    indep_anisotropic_gaussian_uv_loss,
)
from detectron2_tpu.projects.densepose.densepose_head import (
    DensePoseChartPredictor,
    DensePoseDecoder,
    DensePoseDeepLabHead,
    DensePoseEmbeddingPredictor,
    DensePoseV1ConvXHead,
)
from detectron2_tpu.projects.densepose.hrfpn import HRFPN, build_hrfpn_backbone
from detectron2_tpu.projects.densepose.hrnet import (
    PoseHigherResolutionNet,
    build_pose_hrnet_backbone,
)
from detectron2_tpu.projects.densepose.dp_coco_eval import (
    DensePoseCocoEvalEngine,
    DensePoseEvalParams,
    GeodesicMeshTables,
    densepose_metric_names,
)
from detectron2_tpu.projects.densepose.tensor_storage import (
    BlobRef,
    BlobSpool,
    LazyBlob,
    build_densepose_evaluator_storage,
)
from detectron2_tpu.projects.densepose.evaluation import (
    DensePoseCOCOEvaluator,
    MeshAlignmentEvaluator,
    MeshDistanceProvider,
    SmplDistanceProvider,
    load_smpl_mesh_tables,
)
from detectron2_tpu.projects.densepose.roi_heads import DensePoseROIHeads
from detectron2_tpu.projects.densepose.structures import (
    DensePoseChartResult,
    DensePoseChartResultQuantized,
    DensePoseChartResultWithConfidences,
    DensePoseDataRelative,
    DensePoseList,
    DensePoseTransformData,
    compress_quantized_densepose_chart_result,
    decompress_compressed_densepose_chart_result,
    quantize_densepose_chart_result,
)
from detectron2_tpu.projects.densepose.converters import (
    ToChartResultConverter,
    ToChartResultConverterWithConfidences,
    ToMaskConverter,
    densepose_chart_predictor_output_hflip,
    densepose_chart_predictor_output_to_result,
    densepose_chart_predictor_output_to_result_with_confidences,
    predictor_output_with_coarse_segm_to_mask,
)
from detectron2_tpu.projects.densepose.bootstrap import (
    DensePoseBaseSampler,
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    InferenceBasedLoader,
    MaskFromDensePoseSampler,
    PredictionToGroundTruthSampler,
    ScoreBasedFilter,
)
from detectron2_tpu.projects.densepose.video import (
    AllFramesSelector,
    FirstKFramesSelector,
    FrameSelectionStrategy,
    LastKFramesSelector,
    RandomKFramesSelector,
    VideoKeyframeDataset,
    frame_selector_from_strategy,
    read_keyframe_helper_data,
    video_list_from_file,
)
from detectron2_tpu.projects.densepose.build import (
    BootstrapDatasetFactoryCatalog,
    CombinedDataLoader,
    DatasetType,
    ImageListDataset,
    ImageResizeTransform,
    build_bootstrap_dataset,
    build_combined_loader,
    build_combined_train_loader,
    build_data_filter,
    build_data_sampler,
    build_frame_selector,
    build_inference_based_loader,
    build_inference_based_loaders,
    build_transform,
    get_category_to_class_mapping,
    get_class_to_mesh_name_mapping,
    has_inference_based_loaders,
    pack_densepose_points,
    pseudo_to_train_sample,
)
from detectron2_tpu.projects.densepose.datasets import (
    DENSEPOSE_LVIS_DATASETS,
    load_densepose_lvis_json,
    register_chimpnsee,
    register_densepose_lvis,
)
from detectron2_tpu.projects.densepose.meshes import (
    Mesh,
    MeshCatalog,
    MeshInfo,
    create_mesh,
    register_mesh,
    register_meshes,
)
from detectron2_tpu.projects.densepose.trainer import (
    SampleCountingLoader,
    SampleCountMetricPrinter,
    Trainer,
    build_bootstrap_predictor,
)
from detectron2_tpu.projects.densepose.config import (
    add_bootstrap_config,
    add_dataset_category_config,
    add_evaluation_config,
    get_bootstrap_dataset_config,
    load_bootstrap_config,
)
from detectron2_tpu.projects.densepose.dataset_mapper import (
    DensePoseBatchCollator,
    DensePoseDatasetMapper,
    register_densepose_coco,
)
from detectron2_tpu.projects.densepose.dbhelper import EntrySelector, verbosity_to_level
from detectron2_tpu.projects.densepose.vis import (
    BoundingBoxVisualizer,
    CompoundExtractor,
    CompoundVisualizer,
    DensePoseDataCoarseSegmentationVisualizer,
    DensePoseDataPointsIVisualizer,
    DensePoseDataPointsUVisualizer,
    DensePoseDataPointsVisualizer,
    DensePoseDataPointsVVisualizer,
    DensePoseMaskedColormapResultsVisualizer,
    DensePoseOutputsExtractor,
    DensePoseOutputsTextureVisualizer,
    DensePoseOutputsVertexVisualizer,
    DensePoseResultExtractor,
    DensePoseResultsContourVisualizer,
    DensePoseResultsFineSegmentationVisualizer,
    DensePoseResultsUVisualizer,
    DensePoseResultsVisualizerWithTexture,
    DensePoseResultsVVisualizer,
    MatrixVisualizer,
    NmsFilteredExtractor,
    ScoredBoundingBoxVisualizer,
    ScoreThresholdedExtractor,
    create_extractor,
    get_texture_atlas,
    get_texture_atlases,
)

__all__ = [
    "add_densepose_config",
    "add_bootstrap_config",
    "add_dataset_category_config",
    "add_evaluation_config",
    "get_bootstrap_dataset_config",
    "load_bootstrap_config",
    "AllFramesSelector",
    "BootstrapDatasetFactoryCatalog",
    "CombinedDataLoader",
    "DatasetType",
    "ImageListDataset",
    "ImageResizeTransform",
    "build_bootstrap_dataset",
    "build_bootstrap_predictor",
    "build_combined_loader",
    "build_combined_train_loader",
    "build_data_filter",
    "build_data_sampler",
    "build_frame_selector",
    "build_inference_based_loader",
    "build_inference_based_loaders",
    "build_transform",
    "get_category_to_class_mapping",
    "get_class_to_mesh_name_mapping",
    "has_inference_based_loaders",
    "pack_densepose_points",
    "pseudo_to_train_sample",
    "SampleCountingLoader",
    "SampleCountMetricPrinter",
    "Trainer",
    "DENSEPOSE_LVIS_DATASETS",
    "load_densepose_lvis_json",
    "register_chimpnsee",
    "register_densepose_lvis",
    "Mesh",
    "MeshCatalog",
    "MeshInfo",
    "create_mesh",
    "register_mesh",
    "register_meshes",
    "DensePoseV1ConvXHead",
    "DensePoseDeepLabHead",
    "DensePoseChartPredictor",
    "DensePoseEmbeddingPredictor",
    "DensePoseDecoder",
    "DensePoseROIHeads",
    "HRFPN",
    "PoseHigherResolutionNet",
    "build_hrfpn_backbone",
    "build_pose_hrnet_backbone",
    "Embedder",
    "VertexDirectEmbedder",
    "VertexFeatureEmbedder",
    "cse_embedding_loss",
    "closest_vertices_from_embedding",
    "normalize_embeddings",
    "squared_euclidean_distance_matrix",
    "iid_isotropic_gaussian_uv_loss",
    "indep_anisotropic_gaussian_uv_loss",
    "DensePoseCOCOEvaluator",
    "MeshAlignmentEvaluator",
    "DensePoseCocoEvalEngine",
    "DensePoseEvalParams",
    "GeodesicMeshTables",
    "BlobRef",
    "BlobSpool",
    "LazyBlob",
    "build_densepose_evaluator_storage",
    "densepose_metric_names",
    "load_smpl_mesh_tables",
    "MeshDistanceProvider",
    "SmplDistanceProvider",
    "DensePoseDataRelative",
    "DensePoseList",
    "DensePoseTransformData",
    "DensePoseBaseSampler",
    "DensePoseUniformSampler",
    "DensePoseConfidenceBasedSampler",
    "MaskFromDensePoseSampler",
    "PredictionToGroundTruthSampler",
    "ScoreBasedFilter",
    "InferenceBasedLoader",
    "DensePoseChartResult",
    "DensePoseChartResultWithConfidences",
    "DensePoseChartResultQuantized",
    "quantize_densepose_chart_result",
    "compress_quantized_densepose_chart_result",
    "decompress_compressed_densepose_chart_result",
    "ToChartResultConverter",
    "ToChartResultConverterWithConfidences",
    "ToMaskConverter",
    "densepose_chart_predictor_output_hflip",
    "densepose_chart_predictor_output_to_result",
    "densepose_chart_predictor_output_to_result_with_confidences",
    "predictor_output_with_coarse_segm_to_mask",
    "DensePoseDatasetMapper",
    "DensePoseBatchCollator",
    "register_densepose_coco",
    "MatrixVisualizer",
    "DensePoseMaskedColormapResultsVisualizer",
    "DensePoseResultsFineSegmentationVisualizer",
    "DensePoseResultsUVisualizer",
    "DensePoseResultsVVisualizer",
    "DensePoseResultsContourVisualizer",
    "DensePoseResultsVisualizerWithTexture",
    "DensePoseOutputsVertexVisualizer",
    "DensePoseOutputsTextureVisualizer",
    "DensePoseDataCoarseSegmentationVisualizer",
    "DensePoseDataPointsVisualizer",
    "DensePoseDataPointsIVisualizer",
    "DensePoseDataPointsUVisualizer",
    "DensePoseDataPointsVVisualizer",
    "BoundingBoxVisualizer",
    "ScoredBoundingBoxVisualizer",
    "CompoundVisualizer",
    "DensePoseResultExtractor",
    "DensePoseOutputsExtractor",
    "CompoundExtractor",
    "NmsFilteredExtractor",
    "ScoreThresholdedExtractor",
    "create_extractor",
    "get_texture_atlas",
    "get_texture_atlases",
    "EntrySelector",
    "verbosity_to_level",
]
