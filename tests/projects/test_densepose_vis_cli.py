"""DensePose visualization + CLI (apply_net / query_db) tests
(reference projects/DensePose/{apply_net,query_db}.py and densepose/vis/)."""

import os
import pickle

import numpy as np
import pytest

from detectron2_tpu.structures import Boxes, Instances

cv2 = pytest.importorskip("cv2")


def _gray(h=64, w=80):
    return np.full((h, w, 3), 127, np.uint8)


def _chart_instances(h=64, w=80, n=2, m=8, seed=0):
    """Instances with pred_densepose as [M, M, 3] IUV stacks (the compiled
    model's chart output sliced per detection)."""
    rng = np.random.RandomState(seed)
    inst = Instances((h, w))
    boxes = np.array([[4, 4, 36, 44], [40, 8, 72, 56]][:n], np.float32)
    inst.pred_boxes = Boxes(boxes)
    inst.scores = np.linspace(0.9, 0.5, n).astype(np.float32)
    inst.pred_classes = np.zeros(n, np.int64)
    dp = []
    for _ in range(n):
        part = rng.randint(0, 25, (m, m)).astype(np.float32)
        u = rng.rand(m, m).astype(np.float32)
        v = rng.rand(m, m).astype(np.float32)
        dp.append(np.stack([part, u, v], -1))
    inst.pred_densepose = dp
    return inst


class TestChartVisualizers:
    @pytest.mark.parametrize(
        "vis_name",
        [
            "DensePoseResultsFineSegmentationVisualizer",
            "DensePoseResultsUVisualizer",
            "DensePoseResultsVVisualizer",
            "DensePoseResultsContourVisualizer",
        ],
    )
    def test_visualize_changes_pixels(self, vis_name):
        from detectron2_tpu.projects.densepose import vis as dpvis

        inst = _chart_instances()
        extractor = dpvis.DensePoseResultExtractor()
        data = extractor(inst)
        image = _gray()
        out = getattr(dpvis, vis_name)().visualize(image.copy(), data)
        assert out.shape == image.shape and out.dtype == np.uint8
        assert (out != image).any(), f"{vis_name} drew nothing"

    def test_texture_visualizer(self):
        from detectron2_tpu.projects.densepose.vis import (
            DensePoseResultsVisualizerWithTexture,
        )

        # synthetic 6N x 4N atlas, one solid color per part square
        N = 8
        atlas = np.zeros((6 * N, 4 * N, 3), np.uint8)
        for i in range(4):
            for j in range(6):
                atlas[N * j : N * (j + 1), N * i : N * (i + 1)] = (6 * i + j) * 10 + 10
        vis = DensePoseResultsVisualizerWithTexture(atlas)
        texture_image, alpha = vis.get_texture()
        assert texture_image.shape == (24, N, N, 3)
        # part p's square is uniform with value 10p+10 (checks the reshape
        # against the reference's 6*i+j tiling, densepose_results_textures.py:62-69)
        for p in range(24):
            assert (texture_image[p] == p * 10 + 10).all(), p
        inst = _chart_instances()
        from detectron2_tpu.projects.densepose.vis import DensePoseResultExtractor

        image = _gray()
        out = vis.visualize(image.copy(), DensePoseResultExtractor()(inst))
        assert (out != image).any()

    def test_iso_segments_square(self):
        """Marching squares on a radial field: segments approximate the
        iso-circle (endpoint field values interpolate to the level)."""
        from detectron2_tpu.projects.densepose.vis import _iso_segments

        n = 33
        yy, xx = np.mgrid[0:n, 0:n] / (n - 1)
        arr = np.hypot(xx - 0.5, yy - 0.5)
        segs = _iso_segments(arr, np.ones_like(arr, bool), 0.3)
        assert len(segs) > 0
        # all endpoints lie near the circle of radius 0.3 around (0.5, 0.5)
        r = np.hypot(segs[..., 0] - 0.5, segs[..., 1] - 0.5)
        assert np.allclose(r, 0.3, atol=0.5 / (n - 1)), (r.min(), r.max())

    def test_iso_segments_respects_mask(self):
        from detectron2_tpu.projects.densepose.vis import _iso_segments

        arr = np.linspace(0, 1, 16)[None, :].repeat(16, 0)
        mask = np.zeros((16, 16), bool)
        mask[:8] = True
        segs = _iso_segments(arr, mask, 0.5)
        assert len(segs) > 0
        assert (segs[..., 1] <= 8 / 15 + 1e-6).all()


class TestCSEVisualizers:
    @pytest.fixture()
    def tiny_mesh(self, tmp_path):
        from detectron2_tpu.projects.densepose.meshes import (
            MeshCatalog,
            MeshInfo,
            register_mesh,
        )

        K = 12
        rng = np.random.RandomState(1)
        name = "unit_test_mesh"
        data_p = tmp_path / "mesh.pkl"
        tex_p = tmp_path / "tex.pkl"
        with open(data_p, "wb") as f:
            pickle.dump({"vertices": rng.rand(K, 3).astype(np.float32), "faces": []}, f)
        with open(tex_p, "wb") as f:
            pickle.dump({"texcoords": rng.rand(K, 2).astype(np.float32)}, f)
        register_mesh(
            MeshInfo(name=name, data=str(data_p), texcoords=str(tex_p)), base_path=None
        )
        yield name, K
        MeshCatalog.pop(name, None)

    def _cse_instances(self, K, d=4, n=1, m=8):
        rng = np.random.RandomState(2)
        inst = Instances((64, 80))
        inst.pred_boxes = Boxes(np.array([[8, 8, 40, 48]][:n], np.float32))
        inst.scores = np.ones(n, np.float32)
        inst.pred_classes = np.zeros(n, np.int64)
        inst.pred_densepose = [
            {
                "embedding": rng.randn(m, m, d).astype(np.float32),
                "fg": rng.rand(m, m) > 0.3,
            }
            for _ in range(n)
        ]
        return inst, rng.randn(K, d).astype(np.float32)

    def test_vertex_visualizer(self, tiny_mesh):
        from detectron2_tpu.projects.densepose.vis import (
            DensePoseOutputsExtractor,
            DensePoseOutputsVertexVisualizer,
        )

        name, K = tiny_mesh
        inst, vert_emb = self._cse_instances(K)
        vis = DensePoseOutputsVertexVisualizer(
            class_to_mesh_name={0: name}, mesh_vertex_embeddings={name: vert_emb}
        )
        data = DensePoseOutputsExtractor()(inst)
        assert data[2] == [0]
        image = _gray()
        out = vis.visualize(image.copy(), data)
        assert (out != image).any()

    def test_cse_texture_visualizer(self, tiny_mesh):
        from detectron2_tpu.projects.densepose.vis import (
            DensePoseOutputsExtractor,
            DensePoseOutputsTextureVisualizer,
        )

        name, K = tiny_mesh
        inst, vert_emb = self._cse_instances(K)
        atlas = np.full((32, 32, 3), 200, np.uint8)
        vis = DensePoseOutputsTextureVisualizer(
            class_to_mesh_name={0: name},
            mesh_vertex_embeddings={name: vert_emb},
            texture_atlases_dict={name: atlas},
        )
        image = _gray()
        out = vis.visualize(image.copy(), DensePoseOutputsExtractor()(inst))
        assert (out != image).any()


class TestExtractors:
    def test_create_extractor_mapping(self):
        from detectron2_tpu.projects.densepose import vis as dpvis

        pairs = [
            (dpvis.DensePoseResultsUVisualizer(), dpvis.DensePoseResultExtractor),
            (dpvis.BoundingBoxVisualizer(), dpvis.BoundingBoxExtractor),
            (dpvis.ScoredBoundingBoxVisualizer(), dpvis.ScoredBoundingBoxExtractor),
        ]
        for vis, expected in pairs:
            assert isinstance(dpvis.create_extractor(vis), expected), vis
        compound = dpvis.CompoundVisualizer([p[0] for p in pairs])
        ext = dpvis.create_extractor(compound)
        assert isinstance(ext, dpvis.CompoundExtractor)
        assert len(ext.extractors) == 3

    def test_score_thresholded_extractor(self):
        from detectron2_tpu.projects.densepose.vis import (
            ScoredBoundingBoxExtractor,
            ScoreThresholdedExtractor,
        )

        inst = _chart_instances(n=2)  # scores 0.9, 0.5
        ext = ScoreThresholdedExtractor(ScoredBoundingBoxExtractor(), min_score=0.7)
        boxes, scores = ext(inst)
        assert len(boxes) == 1 and scores[0] == pytest.approx(0.9)

    def test_densepose_extractor_resizes_to_box(self):
        from detectron2_tpu.projects.densepose.vis import DensePoseResultExtractor

        inst = _chart_instances(n=1)
        results, boxes_xywh = DensePoseResultExtractor()(inst)
        x, y, w, h = boxes_xywh[0]
        assert results[0].labels.shape == (int(h), int(w))
        assert results[0].uv.shape == (2, int(h), int(w))


class TestEntrySelector:
    def test_all(self):
        from detectron2_tpu.projects.densepose.dbhelper import EntrySelector

        assert EntrySelector.from_string("*")({"anything": 1})

    def test_value_and_range(self):
        from detectron2_tpu.projects.densepose.dbhelper import EntrySelector

        sel = EntrySelector.from_string("image_id:int=18-25,height:int=480")
        assert sel({"image_id": 18, "height": 480})
        assert sel({"image_id": 25, "height": 480})
        assert not sel({"image_id": 26, "height": 480})
        assert not sel({"image_id": 20, "height": 481})

    def test_errors(self):
        from detectron2_tpu.projects.densepose.dbhelper import EntrySelector

        with pytest.raises(ValueError):
            EntrySelector.from_string("=5")
        with pytest.raises(ValueError):
            EntrySelector.from_string("nodelim")


def _register_synth_dp_dataset(tmp_path, name):
    """A one-image dataset with a valid chart DensePose annotation."""
    from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    img_p = str(tmp_path / "im.png")
    cv2.imwrite(img_p, np.full((60, 90, 3), 90, np.uint8))
    from detectron2_tpu.evaluation.rle import mask_to_rle

    segm = np.zeros((256, 256), np.uint8)
    segm[40:200, 40:200] = 1
    rle = mask_to_rle(segm)
    npts = 6
    ann = {
        "bbox": [10.0, 10.0, 40.0, 36.0],
        "bbox_mode": 1,  # XYWH_ABS
        "category_id": 1,
        "dp_x": list(np.linspace(20, 230, npts)),
        "dp_y": list(np.linspace(20, 230, npts)),
        "dp_I": [1, 2, 3, 10, 20, 24],
        "dp_U": list(np.linspace(0.1, 0.9, npts)),
        "dp_V": list(np.linspace(0.9, 0.1, npts)),
        "dp_masks": [rle] + [None] * 13,
    }
    entries = [
        {"file_name": img_p, "image_id": 7, "height": 60, "width": 90, "annotations": [ann]}
    ]
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    DatasetCatalog.register(name, lambda: entries)
    return entries


class TestQueryDB:
    def test_print(self, tmp_path, capsys):
        from detectron2_tpu.projects.densepose.query_db import main

        _register_synth_dp_dataset(tmp_path, "dp_vis_cli_print")
        main(["print", "dp_vis_cli_print", "image_id:int=7"])
        assert "im.png" in capsys.readouterr().out

    def test_print_selector_excludes(self, tmp_path, capsys):
        from detectron2_tpu.projects.densepose.query_db import main

        _register_synth_dp_dataset(tmp_path, "dp_vis_cli_print2")
        main(["print", "dp_vis_cli_print2", "image_id:int=8"])
        assert "im.png" not in capsys.readouterr().out

    def test_show(self, tmp_path):
        from detectron2_tpu.projects.densepose.query_db import main

        _register_synth_dp_dataset(tmp_path, "dp_vis_cli_show")
        out = str(tmp_path / "vis.png")
        main(
            [
                "show",
                "dp_vis_cli_show",
                "*",
                "dp_segm,dp_i,dp_u,dp_v,dp_pts,bbox",
                "--output",
                out,
            ]
        )
        written = str(tmp_path / "vis.0001.png")
        assert os.path.exists(written)
        img = cv2.imread(written)
        assert img.shape == (60, 90, 3)
        # the gt overlay must differ from the grayscale base
        assert (img != np.full((60, 90, 3), 90)).any()


@pytest.mark.slow
class TestApplyNet:
    @pytest.fixture()
    def tiny_model(self, tmp_path):
        """A tiny chart DensePose config + saved checkpoint on disk."""
        import jax

        from detectron2_tpu.checkpoint import DetectionCheckpointer
        from detectron2_tpu.config import get_cfg
        from detectron2_tpu.modeling import build_model
        from detectron2_tpu.projects.densepose import add_densepose_config

        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
        cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
        cfg.MODEL.RESNETS.DEPTH = 18
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
        cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
        cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
        cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
        cfg.MODEL.MASK_ON = False
        cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
        cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
        cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
        cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 32
        cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 32
        cfg.TEST.DETECTIONS_PER_IMAGE = 8
        cfg.INPUT.MIN_SIZE_TEST = 64
        cfg.INPUT.MAX_SIZE_TEST = 96
        cfg.TPU.COMPUTE_DTYPE = "float32"

        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        model = build_model(cfg)
        import numpy as np

        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            dummy,
            train=False,
        )
        ckpt = DetectionCheckpointer(params, save_dir=str(tmp_path))
        ckpt.save("model_tiny")
        img_p = str(tmp_path / "in.png")
        cv2.imwrite(img_p, np.random.RandomState(3).randint(0, 255, (60, 90, 3), np.uint8))
        return cfg_path, str(tmp_path / "model_tiny.ckpt"), img_p

    def test_dump_and_show(self, tiny_model, tmp_path):
        from detectron2_tpu.projects.densepose.apply_net import main

        cfg_path, model_path, img_p = tiny_model
        out_pkl = str(tmp_path / "results.pkl")
        main(["dump", cfg_path, model_path, img_p, "--output", out_pkl])
        assert os.path.exists(out_pkl)
        with open(out_pkl, "rb") as f:
            results = pickle.load(f)
        assert len(results) == 1 and results[0]["file_name"] == img_p
        assert "pred_boxes_XYXY" in results[0]

        out_png = str(tmp_path / "shown.png")
        main(
            [
                "show",
                cfg_path,
                model_path,
                img_p,
                "dp_contour,dp_segm,dp_u,dp_v,bbox",
                "--min_score",
                "0.0",
                "--output",
                out_png,
            ]
        )
        assert os.path.exists(str(tmp_path / "shown.0001.png"))
