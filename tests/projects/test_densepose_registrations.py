"""DensePose dataset + mesh catalog registrations (reference
projects/DensePose/densepose/data/datasets/lvis.py, chimpnsee.py,
data/meshes/catalog.py + builtin.py)."""

import json
import pickle

import numpy as np

from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_tpu.projects.densepose import (
    DENSEPOSE_LVIS_DATASETS,
    DatasetType,
    Mesh,
    MeshCatalog,
    MeshInfo,
    create_mesh,
    load_densepose_lvis_json,
    register_chimpnsee,
    register_densepose_lvis,
    register_mesh,
)


def test_densepose_lvis_registration_names():
    register_densepose_lvis(root="/nonexistent")
    for name in DENSEPOSE_LVIS_DATASETS:
        assert name in DatasetCatalog
        meta = MetadataCatalog.get(name)
        assert meta.json_file.endswith(".json")
        assert meta.evaluator_type == "lvis"


def test_chimpnsee_registration_schema():
    register_chimpnsee(root="/data/sets")
    meta = MetadataCatalog.get("chimpnsee")
    assert meta.dataset_type == DatasetType.VIDEO_LIST
    assert meta.video_list_fpath == "/data/sets/chimpnsee/cdna.eva.mpg.de/video_list.txt"
    assert meta.category == "chimpanzee"


def test_load_densepose_lvis_json_carries_dp_keys(tmp_path):
    """The DP-LVIS loader keeps dp_*/CSE keys and raw category ids, and
    resolves file names via coco_url when file_name is absent."""
    lvis = {
        "images": [
            {
                "id": 7,
                "height": 10,
                "width": 20,
                "coco_url": "http://images.cocodataset.org/train2017/000000000001.jpg",
            }
        ],
        "annotations": [
            {
                "id": 1,
                "image_id": 7,
                "category_id": 225,  # raw id kept (category mapping postponed)
                "bbox": [1, 2, 3, 4],
                "segmentation": [[0, 0, 5, 0, 5, 5]],
                "dp_x": [10.0],
                "dp_y": [20.0],
                "dp_vertex": [123],
                "ref_model": "cat_7466",
            }
        ],
        "categories": [{"id": 225, "name": "cat", "synonyms": ["cat"]}],
    }
    p = tmp_path / "dp_lvis.json"
    p.write_text(json.dumps(lvis))
    records = load_densepose_lvis_json(str(p), "/imgroot", "dp_lvis_synth_test")
    assert len(records) == 1
    rec = records[0]
    assert rec["file_name"] == "/imgroot/train2017/000000000001.jpg"
    obj = rec["annotations"][0]
    assert obj["category_id"] == 225
    assert obj["dp_vertex"] == [123] and obj["ref_model"] == "cat_7466"
    assert obj["dp_x"] == [10.0] and obj["segmentation"]
    assert MetadataCatalog.get("dp_lvis_synth_test").thing_classes == ["cat"]


def test_mesh_catalog_builtin_and_ids():
    """All 13 reference meshes are registered with stable ids; horse reuses
    the zebra texcoords file (reference meshes/builtin.py:60-66)."""
    expected = {
        "smpl_27554",
        "chimp_5029",
        "cat_5001",
        "cat_7466",
        "sheep_5004",
        "zebra_5002",
        "horse_5004",
        "giraffe_5002",
        "elephant_5002",
        "dog_5002",
        "dog_7466",
        "cow_5002",
        "bear_4936",
    }
    assert expected.issubset(set(MeshCatalog.keys()))
    for name in expected:
        mesh_id = MeshCatalog.get_mesh_id(name)
        assert MeshCatalog.get_mesh_name(mesh_id) == name
        info = MeshCatalog[name]
        assert info.data.endswith(".pkl") and info.geodists and info.symmetry
    assert MeshCatalog["horse_5004"].texcoords.endswith("texcoords_zebra_5002.pkl")


def test_create_mesh_from_local_files(tmp_path):
    """create_mesh loads pickled arrays from locally registered paths."""
    data = {
        "vertices": np.zeros((5, 3), np.float32),
        "faces": np.zeros((4, 3), np.int64),
    }
    geod = {"geodists": np.arange(25, dtype=np.float32).reshape(5, 5)}
    dp = tmp_path / "tiny.pkl"
    gp = tmp_path / "tiny_geo.pkl"
    dp.write_bytes(pickle.dumps(data))
    gp.write_bytes(pickle.dumps(geod))
    register_mesh(MeshInfo(name="tiny_test_mesh", data=str(dp), geodists=str(gp)), base_path=None)
    mesh = create_mesh("tiny_test_mesh")
    assert isinstance(mesh, Mesh)
    assert mesh.vertices.shape == (5, 3) and mesh.faces.shape == (4, 3)
    np.testing.assert_array_equal(mesh.get_geodists(), geod["geodists"])
