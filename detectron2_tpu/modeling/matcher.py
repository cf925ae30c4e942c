"""Matcher: assign each prediction to a ground-truth by IoU thresholds.

Parity with reference detectron2/modeling/matcher.py:9-127, fixed-shape:
ground truth comes padded with a validity mask (invalid gt rows are given
-inf quality so they can never win a match); outputs have the predictions'
static shape.
"""

from typing import List, Optional, Tuple

import jax.numpy as jnp

__all__ = ["Matcher"]


class Matcher:
    """Assigns to each predicted "element" (e.g. a box) a ground-truth
    element. Each prediction matches zero or one gt; each gt may match many
    predictions.

    Matching is based on an MxN match_quality_matrix that characterizes how
    well each (gt, prediction) pair matches; matches are bucketed into labels
    by thresholds, e.g. thresholds=[0.3, 0.5], labels=[0, -1, 1] gives
    negative / ignored / positive bands.
    """

    def __init__(
        self,
        thresholds: List[float],
        labels: List[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        thresholds.insert(0, -float("inf"))
        thresholds.append(float("inf"))
        assert all(low <= high for (low, high) in zip(thresholds[:-1], thresholds[1:]))
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) - 1
        self.thresholds = thresholds
        self.labels = labels
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
            match_quality_matrix: [M, N] pairwise quality (M gt, N predictions).
            gt_valid: optional [M] bool — False rows are padding and can never
                match (the fixed-shape analogue of the reference's dynamic M).

        Returns:
            matches: int32 [N], best-matching gt index per prediction (0 when
                there is no valid gt at all).
            match_labels: int8 [N] in {-1, 0, 1}: ignore / negative / positive.
                With no valid gt, all predictions are labeled with labels[0]
                (background), matching the reference's empty-gt path
                (matcher.py:75-82).
        """
        M, N = match_quality_matrix.shape
        quality = match_quality_matrix
        if gt_valid is not None:
            quality = jnp.where(gt_valid[:, None], quality, -jnp.inf)

        matched_vals = jnp.max(quality, axis=0)  # [N]
        matches = jnp.argmax(quality, axis=0).astype(jnp.int32)  # [N]

        match_labels = jnp.full((N,), self.labels[0], dtype=jnp.int8)
        for label, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_band = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_band, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            match_labels = self.set_low_quality_matches(match_labels, quality, gt_valid)

        # no valid gt at all -> everything is background (quality was all -inf,
        # already mapped to labels[0] band by the -inf matched_vals)
        return matches, match_labels

    def set_low_quality_matches(
        self,
        match_labels: jnp.ndarray,
        match_quality_matrix: jnp.ndarray,
        gt_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """For each gt, mark the prediction(s) with the gt's maximum overlap
        as positive, including ties (reference matcher.py:106-127). This keeps
        every gt with at least one positive anchor."""
        highest_quality_foreach_gt = jnp.max(match_quality_matrix, axis=1)  # [M]
        is_best = match_quality_matrix == highest_quality_foreach_gt[:, None]  # [M, N]
        # gt with zero best quality (e.g. padded or degenerate) must not force positives
        has_overlap = highest_quality_foreach_gt > 0
        if gt_valid is not None:
            has_overlap = has_overlap & gt_valid
        pred_is_forced = jnp.any(is_best & has_overlap[:, None], axis=0)  # [N]
        return jnp.where(pred_is_forced, jnp.int8(1), match_labels)
