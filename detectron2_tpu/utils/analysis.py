"""Model analysis: flops / activations / parameter counting
(reference detectron2/utils/analysis.py:55-157).

jax makes flop counting exact: XLA's cost analysis on the compiled program
reports flops/bytes for the whole fused computation — more accurate than the
reference's per-op fvcore handles.
"""

import logging
from typing import Any, Callable, Dict

import numpy as np

import jax

logger = logging.getLogger(__name__)

__all__ = [
    "FlopCountAnalysis",
    "flop_count_operators",
    "activation_count_operators",
    "parameter_count",
    "parameter_count_table",
    "tpu_peak_flops",
    "mfu",
    "compile_with_flops",
]


def parameter_count(params) -> Dict[str, int]:
    """Parameter counts per top-level scope + total ('')."""
    counts: Dict[str, int] = {"": 0}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        counts[""] += n
        for depth in range(1, min(len(keys), 4)):
            prefix = ".".join(keys[:depth])
            counts[prefix] = counts.get(prefix, 0) + n
    return counts


def parameter_count_table(params, max_depth: int = 3) -> str:
    counts = parameter_count(params)
    rows = sorted(counts.items())
    lines = [f"{'name':<60} #params"]
    for name, n in rows:
        depth = name.count(".") + (1 if name else 0)
        if depth > max_depth:
            continue
        lines.append(f"{name or 'model':<60} {n / 1e6:.3f}M")
    return "\n".join(lines)


class FlopCountAnalysis:
    """XLA-cost-analysis-based flop counter for a jitted callable."""

    def __init__(self, fn: Callable, inputs):
        self._fn = fn
        self._inputs = inputs
        self._analysis = None

    def _get(self) -> Dict[str, Any]:
        if self._analysis is None:
            jitted = jax.jit(self._fn)
            compiled = jitted.lower(*self._inputs).compile()
            self._analysis = compiled.cost_analysis() or {}
        return self._analysis

    def total(self) -> float:
        """Total flops of the compiled program."""
        return float(self._get().get("flops", 0.0))

    def bytes_accessed(self) -> float:
        return float(self._get().get("bytes accessed", 0.0))


def flop_count_operators(fn: Callable, inputs) -> Dict[str, float]:
    """Gflops of the compiled program (the reference reports per-operator
    counts; XLA reports post-fusion totals, which is the meaningful number on
    TPU)."""
    return {"total": FlopCountAnalysis(fn, inputs).total() / 1e9}


def activation_count_operators(fn: Callable, inputs) -> Dict[str, float]:
    """Approximate activation megacounts via output bytes of the program."""
    fca = FlopCountAnalysis(fn, inputs)
    return {"total_bytes_maccessed": fca.bytes_accessed() / 1e6}


# Peak dense matmul throughput per chip, by jax device_kind. bf16 numbers;
# f32 runs at half rate on the MXU. Sources: published TPU spec sheets.
TPU_PEAK_BF16_FLOPS = {
    "TPU v2": 23e12,  # per chip (2 cores x 11.5)
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
    "TPU7x": 2307e12,  # Ironwood (bf16)
}


def tpu_peak_flops(device=None, dtype: str = "bfloat16"):
    """Peak FLOP/s of one chip, or None if the device kind is unknown
    (e.g. the CPU backend). f32 is half the bf16 MXU rate."""
    if device is None:
        device = jax.devices()[0]
    peak = TPU_PEAK_BF16_FLOPS.get(getattr(device, "device_kind", ""))
    if peak is None:
        return None
    if dtype in ("float32", "f32"):
        peak = peak / 2
    return peak


def mfu(flops_per_step: float, step_time_s: float, device=None, dtype: str = "bfloat16"):
    """Model flops utilization: achieved FLOP/s over the chip's peak.

    ``flops_per_step`` should come from XLA cost analysis of the compiled
    program (:class:`FlopCountAnalysis`), making this the exact definition —
    not an analytic-formula estimate. Returns None off-TPU."""
    peak = tpu_peak_flops(device, dtype)
    if peak is None or step_time_s <= 0:
        return None
    return (flops_per_step / step_time_s) / peak


def compile_with_flops(fn, *args, **jit_kwargs):
    """jit-compile ``fn`` on ``args`` and return ``(compiled, flops)``.

    The same executable serves the timed benchmark calls and XLA's exact
    per-call flop count, so the MFU column measures the program that actually
    ran. ``flops`` is 0.0 when the backend reports no cost analysis."""
    compiled = jax.jit(fn, **jit_kwargs).lower(*args).compile()
    try:
        flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    return compiled, flops


def find_unused_parameters(grads) -> list:
    """Parameters receiving exactly zero gradient (the jax analogue of
    reference analysis.py:158 find_unused_parameters)."""
    unused = []
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, leaf in flat:
        if float(np.abs(np.asarray(leaf)).sum()) == 0.0:
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            unused.append(".".join(keys))
    return unused
