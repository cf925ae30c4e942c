"""Bounded-memory spool for heavy per-detection DensePose payloads.

Role matches the reference's evaluation storage (reference
projects/DensePose/densepose/evaluation/tensor_storage.py:1-239 +
evaluation/evaluator.py build_densepose_evaluator_storage): COCO-DensePose
eval produces a box-sized [3, h, w] IUV stack per detection, and gathering
every stack to rank 0 as pickled python objects is what makes multi-process
eval RAM-bound. With a spool, ``process()`` appends each array to a per-rank
append-only buffer and keeps only a tiny :class:`BlobRef`; the cross-process
gather moves refs, and rank 0 reads arrays back one at a time while the
engine runs, so peak memory is one record, not the dataset.

Design differs from the reference where our payloads differ: the reference
stores FIXED-schema records (its raw predictor outputs are all 112x112), so
it can seek by ``record_id * record_size``. Our quantized IUV stacks are
box-sized (variable shape), so each ref carries its own (offset, shape,
dtype) and the spool is a plain append-only byte stream — no schema object.

Backends:

- ``ram``  — io.BytesIO per rank; cross-process reads gather the raw buffer
  bytes once (still one copy, but pickled-object overhead and the per-array
  duplication in the predictions list are gone).
- ``file`` — ``densepose_eval_spool_rank{N}.bin`` under a shared directory;
  cross-process reads open the other ranks' files lazily (requires a shared
  filesystem, same contract as the reference's file storage).

``build_densepose_evaluator_storage(cfg, output_dir)`` maps the
``DENSEPOSE_EVALUATION.STORAGE`` config value ("none" | "ram" | "file") to a
spool instance (None for "none").
"""

import io
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

from detectron2_tpu.utils import comm

__all__ = [
    "BlobRef",
    "BlobSpool",
    "LazyBlob",
    "build_densepose_evaluator_storage",
]


@dataclass(frozen=True)
class BlobRef:
    """Locator of one stored array: which rank wrote it, where, and how to
    decode it. Cheap to pickle through comm.gather."""

    rank: int
    offset: int
    shape: Tuple[int, ...]
    dtype: str

    @property
    def nbytes(self) -> int:
        return int(np.dtype(self.dtype).itemsize * int(np.prod(self.shape, dtype=np.int64)))


class BlobSpool:
    """Per-rank append-only array store with cross-rank read-back.

    Lifecycle: every rank ``put()``s during evaluator.process(); then ALL
    ranks call ``finalize_for_read()`` (collective for the ram backend); then
    rank 0 ``get()``s any ref, including other ranks'.
    """

    def __init__(self, kind: str, directory: Optional[str] = None):
        assert kind in ("ram", "file"), kind
        self.kind = kind
        self._rank = comm.get_rank()
        self._dir = directory
        if kind == "ram":
            self._write_buf: Any = io.BytesIO()
        else:
            assert directory, "file spool needs a (shared) directory"
            os.makedirs(directory, exist_ok=True)
            self._write_buf = open(self._path(self._rank), "wb")
        self._read_bufs: Dict[int, Any] = {}
        self._finalized = False

    def _path(self, rank: int) -> str:
        return os.path.join(self._dir, f"densepose_eval_spool_rank{rank}.bin")

    # ------------------------------------------------------------- writing

    def put(self, arr: np.ndarray) -> BlobRef:
        assert not self._finalized, "spool already finalized for reading"
        arr = np.ascontiguousarray(arr)
        offset = self._write_buf.tell()
        self._write_buf.write(arr.tobytes())
        return BlobRef(self._rank, offset, tuple(arr.shape), str(arr.dtype))

    # ------------------------------------------------------------- reading

    def finalize_for_read(self):
        """Switch to read mode. COLLECTIVE for the ram backend (every rank
        contributes its buffer; rank 0 keeps all of them); for the file
        backend it flushes and barriers so rank 0 sees complete files."""
        if self._finalized:
            return
        self._finalized = True
        if self.kind == "ram":
            payload = self._write_buf.getvalue()
            gathered = comm.gather(payload)
            if comm.is_main_process():
                self._read_bufs = {r: io.BytesIO(b) for r, b in enumerate(gathered)}
            self._write_buf = io.BytesIO()  # drop the local copy on non-main
        else:
            self._write_buf.flush()
            os.fsync(self._write_buf.fileno())
            self._write_buf.close()
            comm.synchronize("densepose_spool_finalize")

    def get(self, ref: BlobRef) -> np.ndarray:
        assert self._finalized, "call finalize_for_read() (on ALL ranks) first"
        buf = self._read_bufs.get(ref.rank)
        if buf is None:
            assert self.kind == "file", f"no gathered ram buffer for rank {ref.rank}"
            buf = open(self._path(ref.rank), "rb")
            self._read_bufs[ref.rank] = buf
        buf.seek(ref.offset)
        data = buf.read(ref.nbytes)
        assert len(data) == ref.nbytes, (len(data), ref)
        return np.frombuffer(data, ref.dtype).reshape(ref.shape)

    def close(self):
        for b in self._read_bufs.values():
            try:
                b.close()
            except Exception:
                pass
        self._read_bufs = {}


class LazyBlob:
    """``np.asarray``-compatible handle over a spooled array: the eval engine
    reads detections via ``np.asarray(dt["densepose"])``, so handing it a
    LazyBlob loads each record from the spool at the moment of use and frees
    it after — peak eval memory is one IUV stack."""

    __slots__ = ("_spool", "_ref")

    def __init__(self, spool: BlobSpool, ref: BlobRef):
        self._spool = spool
        self._ref = ref

    def __array__(self, dtype=None, copy=None):
        arr = self._spool.get(self._ref)
        return arr if dtype is None else arr.astype(dtype)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self._ref.shape

    def __getitem__(self, idx):
        return self._spool.get(self._ref)[idx]


def build_densepose_evaluator_storage(storage_spec: str, output_dir: Optional[str] = None):
    """``DENSEPOSE_EVALUATION.STORAGE`` -> spool (None when "none"). The file
    backend spools under ``<output_dir>/densepose_eval`` (must be on a shared
    filesystem for multi-host eval, same contract as the reference's)."""
    if storage_spec in (None, "", "none"):
        return None
    if storage_spec == "ram":
        return BlobSpool("ram")
    if storage_spec == "file":
        assert output_dir, "STORAGE='file' needs cfg.OUTPUT_DIR"
        return BlobSpool("file", os.path.join(output_dir, "densepose_eval"))
    raise ValueError(f"unknown DENSEPOSE_EVALUATION.STORAGE: {storage_spec!r}")
