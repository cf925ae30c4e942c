"""DensePose data subsystem: DensePoseDataRelative transforms, the dataset
mapper's padded point arrays, result converters, and quantization round-trip
(reference projects/DensePose/densepose/{structures,converters,data}/)."""

import numpy as np
import pytest

from detectron2_tpu.data.transforms import HFlipTransform, ResizeTransform, TransformList
from detectron2_tpu.projects.densepose import (
    DensePoseChartResult,
    DensePoseDataRelative,
    DensePoseTransformData,
    compress_quantized_densepose_chart_result,
    decompress_compressed_densepose_chart_result,
    densepose_chart_predictor_output_to_result,
    predictor_output_with_coarse_segm_to_mask,
    quantize_densepose_chart_result,
)


def _annotation(n=5, with_segm=False):
    rng = np.random.RandomState(3)
    ann = {
        "dp_x": (rng.rand(n) * 255).tolist(),
        "dp_y": (rng.rand(n) * 255).tolist(),
        "dp_I": rng.randint(1, 25, n).tolist(),
        "dp_U": rng.rand(n).tolist(),
        "dp_V": rng.rand(n).tolist(),
    }
    if with_segm:
        from detectron2_tpu.evaluation.rle import mask_to_rle

        masks = []
        for i in range(14):
            m = np.zeros((256, 256), np.uint8)
            if i < 2:  # two non-empty parts
                m[10 * i : 10 * i + 10, 20:40] = 1
            rle = mask_to_rle(m)
            rle["counts"] = rle["counts"].decode("ascii") if isinstance(rle["counts"], bytes) else rle["counts"]
            masks.append(rle if m.any() else {})
        ann["dp_masks"] = masks
    return ann


def test_data_relative_parses_and_validates():
    ann = _annotation(with_segm=True)
    ok, _ = DensePoseDataRelative.validate_annotation(ann)
    assert ok
    dp = DensePoseDataRelative(ann, cleanup=True)
    assert dp.x.shape == (5,) and dp.i.dtype == np.int64
    assert dp.segm.shape == (256, 256)
    # two parts rasterized with labels 1 and 2
    assert set(np.unique(dp.segm)) == {0.0, 1.0, 2.0}
    # cleanup removed the keys
    assert "dp_x" not in ann and "dp_masks" not in ann


def test_data_relative_hflip_semantics():
    ann = _annotation(with_segm=True)
    dp = DensePoseDataRelative(ann)
    x_before = dp.x.copy()
    i_before = dp.i.copy()
    segm_before = dp.segm.copy()
    tl = TransformList([HFlipTransform(width=640)])
    dp.apply_transform(tl, DensePoseTransformData())
    # x mirrored in the 256 box frame (NOT the image frame — coords are
    # box-relative, reference data_relative.py:180-184)
    np.testing.assert_allclose(dp.x, 256 - x_before)
    # part labels swapped left<->right per POINT_LABEL_SYMMETRIES
    sym = DensePoseTransformData.POINT_LABEL_SYMMETRIES
    np.testing.assert_array_equal(dp.i, [sym[i] for i in i_before])
    # segm flipped horizontally with MASK_LABEL_SYMMETRIES applied
    msym = np.array(DensePoseTransformData.MASK_LABEL_SYMMETRIES, np.float32)
    np.testing.assert_allclose(dp.segm, msym[segm_before[:, ::-1].astype(int)])
    # double flip restores everything
    dp.apply_transform(tl, DensePoseTransformData())
    np.testing.assert_allclose(dp.x, x_before)
    np.testing.assert_array_equal(dp.i, i_before)
    np.testing.assert_allclose(dp.segm, segm_before)


def test_data_relative_resize_is_noop():
    ann = _annotation()
    dp = DensePoseDataRelative(ann)
    x, y = dp.x.copy(), dp.y.copy()
    tl = TransformList([ResizeTransform(480, 640, 800, 1333)])
    dp.apply_transform(tl, DensePoseTransformData())
    np.testing.assert_allclose(dp.x, x)  # box-relative: resize moves the box
    np.testing.assert_allclose(dp.y, y)


def test_uv_symmetry_table_applied():
    ann = {
        "dp_x": [10.0], "dp_y": [20.0], "dp_I": [3], "dp_U": [0.25], "dp_V": [0.5],
    }
    dp = DensePoseDataRelative(ann)
    # part 3 flips to 4; its U table sends everything to 0.75
    uv = {
        "U_transforms": np.stack([np.full((256, 256), 0.75, np.float32)] * 24),
        "V_transforms": np.stack([np.full((256, 256), 0.125, np.float32)] * 24),
    }
    tdata = DensePoseTransformData(uv)
    dp.apply_transform(TransformList([HFlipTransform(width=100)]), tdata)
    assert dp.i[0] == 4
    assert dp.u[0] == pytest.approx(0.75)
    assert dp.v[0] == pytest.approx(0.125)


def test_chart_result_converter_analytic():
    # 2x2 predictor maps, box 4x4: coarse everywhere fg, fine picks part 2
    # in the top half and part 1 in the bottom half
    S = 2
    coarse = np.zeros((S, S, 2), np.float32)
    coarse[..., 1] = 1.0  # fg
    fine = np.zeros((S, S, 3), np.float32)
    fine[0, :, 2] = 5.0  # top rows -> part 2
    fine[1, :, 1] = 5.0  # bottom rows -> part 1
    u = np.zeros((S, S, 3), np.float32)
    u[..., 1] = 0.25
    u[..., 2] = 0.5
    v = np.zeros((S, S, 3), np.float32)
    v[..., 1] = 0.75
    v[..., 2] = 1.0
    out = {"coarse_segm": coarse, "fine_segm": fine, "u": u, "v": v}
    res = densepose_chart_predictor_output_to_result(out, np.array([10, 10, 14, 14]))
    assert isinstance(res, DensePoseChartResult)
    assert res.labels.shape == (4, 4)
    assert (res.labels[0] == 2).all() and (res.labels[-1] == 1).all()
    assert res.uv[0, 0, 0] == pytest.approx(0.5)  # U of part 2
    assert res.uv[1, -1, 0] == pytest.approx(0.75)  # V of part 1


def test_coarse_segm_to_mask_paste():
    S = 2
    coarse = np.zeros((1, S, S, 2), np.float32)
    coarse[..., 1] = 1.0
    boxes = np.array([[2.0, 3.0, 6.0, 7.0]])
    masks = predictor_output_with_coarse_segm_to_mask(coarse, boxes, (10, 10))
    m = np.asarray(masks.tensor[0])
    assert m[3:7, 2:6].all()
    assert m.sum() == 16


def test_quantize_compress_roundtrip():
    rng = np.random.RandomState(0)
    res = DensePoseChartResult(
        labels=rng.randint(0, 25, (13, 9)).astype(np.int64),
        uv=rng.rand(2, 13, 9).astype(np.float32),
    )
    q = quantize_densepose_chart_result(res)
    assert q.labels_uv_uint8.shape == (3, 13, 9)
    np.testing.assert_array_equal(q.labels_uv_uint8[0], res.labels)
    c = compress_quantized_densepose_chart_result(q)
    q2 = decompress_compressed_densepose_chart_result(c)
    np.testing.assert_array_equal(q.labels_uv_uint8, q2.labels_uv_uint8)


def test_dataset_mapper_padded_points(tmp_path):
    """End-to-end: a synthetic record through DensePoseDatasetMapper +
    DensePoseBatchCollator produces the loss's padded batch targets with
    absolute input-frame coordinates."""
    import cv2

    from detectron2_tpu.data.transforms import ResizeShortestEdge
    from detectron2_tpu.projects.densepose import (
        DensePoseBatchCollator,
        DensePoseDatasetMapper,
    )

    img_path = tmp_path / "im.png"
    cv2.imwrite(str(img_path), np.zeros((100, 200, 3), np.uint8))

    record = {
        "file_name": str(img_path),
        "image_id": 1,
        "height": 100,
        "width": 200,
        "annotations": [
            {
                "bbox": [20, 10, 60, 80],  # XYWH
                "bbox_mode": 1,  # BoxMode.XYWH_ABS
                "category_id": 0,
                "iscrowd": 0,
                "dp_x": [0.0, 128.0, 255.0],
                "dp_y": [0.0, 128.0, 255.0],
                "dp_I": [1, 2, 3],
                "dp_U": [0.1, 0.2, 0.3],
                "dp_V": [0.4, 0.5, 0.6],
            }
        ],
    }
    mapper = DensePoseDatasetMapper(
        is_train=True,
        augmentations=[ResizeShortestEdge([200], 400, "choice")],
        image_format="BGR",
        max_points=8,
    )
    out = mapper(record)
    inst = out["instances"]
    assert len(inst) == 1
    pts = inst.gt_dp_points[0]
    box = np.asarray(inst.gt_boxes.tensor[0])
    # scale factor 2: box [40, 20, 160, 180]
    np.testing.assert_allclose(box, [40, 20, 160, 180], atol=1e-4)
    # point 0 at box corner, point 1 at center, point 2 near far corner
    np.testing.assert_allclose(pts[0], [40, 20], atol=1e-3)
    np.testing.assert_allclose(pts[1], [40 + 120 * 0.5, 20 + 160 * 0.5], atol=0.5)
    np.testing.assert_allclose(pts[2], [40 + 120 * 255 / 256, 20 + 160 * 255 / 256], atol=0.5)
    assert (inst.gt_dp_part[0, :3] == [1, 2, 3]).all()
    assert (inst.gt_dp_part[0, 3:] == -1).all()

    batch = DensePoseBatchCollator(max_gt_instances=4)([out])
    assert batch["gt_dp_points"].shape == (1, 4, 8, 2)
    assert batch["gt_dp_part"].shape == (1, 4, 8)
    np.testing.assert_allclose(batch["gt_dp_points"][0, 0], pts)
    assert (batch["gt_dp_part"][0, 1:] == -1).all()
    np.testing.assert_allclose(batch["gt_dp_u"][0, 0, :3], [0.1, 0.2, 0.3], atol=1e-6)


def test_densepose_visualizers_draw():
    """Extractor + fine-seg/U/V visualizers run end to end and modify only
    the box region (reference vis/densepose_results.py:310-342)."""
    from detectron2_tpu.projects.densepose.vis import (
        DensePoseResultExtractor,
        DensePoseResultsFineSegmentationVisualizer,
        DensePoseResultsUVisualizer,
        DensePoseResultsVVisualizer,
    )
    from detectron2_tpu.structures import Boxes, Instances

    S = 4
    coarse = np.zeros((S, S, 2), np.float32)
    coarse[..., 1] = 1.0
    fine = np.zeros((S, S, 3), np.float32)
    fine[..., 2] = 1.0
    u = np.full((S, S, 3), 0.5, np.float32)
    v = np.full((S, S, 3), 0.25, np.float32)
    inst = Instances((40, 40))
    inst.pred_boxes = Boxes(np.array([[8.0, 4.0, 24.0, 20.0]], np.float32))
    inst.scores = np.array([0.9], np.float32)
    inst.pred_densepose = [{"coarse_segm": coarse, "fine_segm": fine, "u": u, "v": v}]

    outputs = DensePoseResultExtractor()(inst)
    assert outputs[0] is not None and len(outputs[0]) == 1
    np.testing.assert_allclose(outputs[1][0], [8, 4, 16, 16])

    for vis_cls in (
        DensePoseResultsFineSegmentationVisualizer,
        DensePoseResultsUVisualizer,
        DensePoseResultsVVisualizer,
    ):
        img = np.full((40, 40, 3), 100, np.uint8)
        out = vis_cls(alpha=1.0).visualize(img, outputs)
        assert out.shape == (40, 40, 3)
        inside = out[4:20, 8:24]
        outside_unchanged = (np.delete(out.reshape(-1, 3), 0, 0) is not None)
        assert (out[:4] == 100).all() and (out[20:] == 100).all()
        assert not (inside == 100).all(), vis_cls.__name__


def test_extractor_handles_iuv_stack():
    """The compiled model's [M, M, 3] IUV output format is also accepted."""
    from detectron2_tpu.projects.densepose.vis import DensePoseResultExtractor
    from detectron2_tpu.structures import Boxes, Instances

    M = 4
    iuv = np.zeros((M, M, 3), np.float32)
    iuv[..., 0] = 7
    iuv[..., 1] = 0.5
    iuv[..., 2] = 0.25
    inst = Instances((30, 30))
    inst.pred_boxes = Boxes(np.array([[5.0, 5.0, 15.0, 13.0]], np.float32))
    inst.pred_densepose = iuv[None]
    results, boxes_xywh = DensePoseResultExtractor()(inst)
    assert results[0].labels.shape == (8, 10)
    assert (results[0].labels == 7).all()
    np.testing.assert_allclose(results[0].uv[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(boxes_xywh[0], [5, 5, 10, 8])


def test_chart_output_hflip_involution():
    """Flip twice with identity UV tables restores the maps; part channels
    are swapped per the point label symmetry on one flip."""
    from detectron2_tpu.projects.densepose.converters import (
        densepose_chart_predictor_output_hflip,
    )

    rng = np.random.RandomState(5)
    H = W = 4
    C = 25
    out = {
        "coarse_segm": rng.rand(H, W, 2).astype(np.float32),
        "fine_segm": rng.rand(H, W, C).astype(np.float32),
        "u": rng.rand(H, W, C).astype(np.float32),
        "v": rng.rand(H, W, C).astype(np.float32),
    }
    tdata = DensePoseTransformData()  # identity UV
    f1 = densepose_chart_predictor_output_hflip(out, tdata)
    sym = tdata.point_label_symmetries
    np.testing.assert_allclose(f1["fine_segm"], out["fine_segm"][:, ::-1][..., sym])
    np.testing.assert_allclose(f1["coarse_segm"], out["coarse_segm"][:, ::-1])
    f2 = densepose_chart_predictor_output_hflip(f1, tdata)
    for k in out:
        np.testing.assert_allclose(f2[k], out[k], atol=1e-6)
