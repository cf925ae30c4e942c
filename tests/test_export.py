"""Export tests (role of reference tests/test_export_torchscript.py /
test_export_onnx.py): TracingAdapter flatten/unflatten round-trip, StableHLO
serialize -> deserialize -> run parity, AOT compile."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.export import (
    TracingAdapter,
    aot_compile,
    export_stablehlo,
    load_compiled,
    save_compiled,
)


def _toy_model(batch):
    x = batch["image"].astype(jnp.float32) / 255.0
    pooled = x.mean(axis=(1, 2))  # [B, C]
    return {
        "scores": jax.nn.sigmoid(pooled @ jnp.ones((pooled.shape[-1], 5))),
        "sizes": batch["image_sizes"].astype(jnp.float32) * 2.0,
    }


def _batch():
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)),
        "image_sizes": jnp.asarray([[16, 16], [12, 14]], np.int32),
    }


def test_tracing_adapter_roundtrip():
    batch = _batch()
    adapter = TracingAdapter(_toy_model, batch)
    flat_out = adapter(*adapter.flattened_inputs)
    assert isinstance(flat_out, tuple)
    out = jax.tree_util.tree_unflatten(adapter.outputs_schema, list(flat_out))
    ref = _toy_model(batch)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-6)


def test_stablehlo_serialize_deserialize_run():
    from jax import export as jax_export

    batch = _batch()
    blob = export_stablehlo(_toy_model, batch)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 100

    restored = jax_export.deserialize(bytearray(blob))
    out = restored.call(batch)
    ref = _toy_model(batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-5)


def test_stablehlo_to_file(tmp_path):
    batch = _batch()
    path = tmp_path / "model.stablehlo"
    blob = export_stablehlo(_toy_model, batch, path=str(path))
    assert path.read_bytes() == blob


def test_aot_compile_runs():
    batch = _batch()
    compiled = aot_compile(_toy_model, batch)
    out = compiled(batch)
    ref = _toy_model(batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-6)


def test_save_load_compiled_executable(tmp_path):
    # the persistent-executable deploy path: serialize the compiled PJRT
    # executable, reload in-place, and get identical outputs with no re-trace
    batch = _batch()
    compiled = aot_compile(_toy_model, batch)
    path = tmp_path / "model.jaxexec"
    save_compiled(compiled, str(path))
    assert path.stat().st_size > 100
    restored = load_compiled(str(path))
    out = restored(batch)
    ref = _toy_model(batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-6)
