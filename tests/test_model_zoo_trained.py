"""model_zoo.get(trained=True) executed offline: the download-cache ->
convert -> load -> build path end to end, minus only the HTTP fetch
(reference model_zoo.py:180-205 get + checkpoint/detection_checkpoint.py).

The zoo checkpoint is fabricated from the vendored reference state_dict
key->shape table (tests/goldens/reference_state_dict_keys.json.gz, dumped
from the reference's real torch models) and pre-placed at the exact cache
path the HTTPURLHandler would download to — so the cache-hit logic, pkl
parsing, d2 name conversion and parameter write-back all run for real.
"""

import gzip
import json
import os
import pickle

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GOLDEN = os.path.join(_REPO, "tests", "goldens", "reference_state_dict_keys.json.gz")

CONFIG = "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml"


def test_get_trained_offline(tmp_path, monkeypatch):
    from detectron2_tpu import model_zoo

    with gzip.open(_GOLDEN, "rt") as f:
        data = json.load(f)
    sig = data["configs"].get(CONFIG) or data["configs"].get(CONFIG.replace(".yaml", ""))
    assert sig is not None, f"{CONFIG} missing from the vendored key table"
    key_shapes = data["signatures"][sig]

    rng = np.random.RandomState(7)
    stem_key = "backbone.bottom_up.stem.conv1.weight"
    assert stem_key in key_shapes, sorted(key_shapes)[:5]
    state_dict = {}
    for k, shape in key_shapes.items():
        if k == stem_key:
            state_dict[k] = rng.randn(*shape).astype(np.float32)
        else:
            state_dict[k] = np.zeros(shape, np.float32)

    # place the fabricated pkl at the exact path the URL handler caches to
    url = model_zoo.get_checkpoint_url(CONFIG)
    from urllib.parse import urlparse

    monkeypatch.setenv("D2T_CACHE", str(tmp_path))
    parsed = urlparse(url)
    cached = tmp_path / parsed.path.lstrip("/")
    cached.parent.mkdir(parents=True, exist_ok=True)
    with open(cached, "wb") as f:
        pickle.dump({"model": state_dict, "__author__": "test"}, f)

    # fresh PathManager handlers pick up the env var lazily per call; get()
    # must now run download-cache (hit) -> pickle -> convert -> load
    model, params = model_zoo.get(CONFIG, trained=True)

    # the stem conv kernel must carry the fabricated checkpoint values
    # (OIHW -> HWIO transpose applied by the converter)
    want = np.transpose(state_dict[stem_key], (2, 3, 1, 0))
    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    hits = [
        np.asarray(leaf)
        for path, leaf in leaves_with_path
        if getattr(leaf, "shape", None) == want.shape and "stem" in str(path).lower()
    ]
    assert hits, "no stem conv kernel of the expected shape found in params"
    assert any(np.allclose(h, want, atol=1e-6) for h in hits), (
        "stem conv kernel does not carry the checkpoint values"
    )
