"""Panoptic-DeepLab post-processing
(reference projects/Panoptic-DeepLab/panoptic_deeplab/post_processing.py).

Fixed-shape device formulation: ``find_instance_center`` keeps a static top-K
center budget (invalid slots get score 0); ``group_pixels`` computes the
[H*W, K] distance matrix between offset-shifted pixel locations and the K
centers and argmins — no nonzero(), no host sync.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["find_instance_center", "group_pixels", "get_panoptic_segmentation"]


def find_instance_center(
    center_heatmap: jnp.ndarray,  # [H, W]
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Peak centers via maxpool NMS + threshold + static top-K.

    Returns (centers [K, 2] (y, x) float, scores [K] — 0 where no center).
    """
    H, W = center_heatmap.shape
    pad = nms_kernel // 2
    pooled = jax.lax.reduce_window(
        center_heatmap,
        -jnp.inf,
        jax.lax.max,
        (nms_kernel, nms_kernel),
        (1, 1),
        [(pad, pad), (pad, pad)],
    )
    is_peak = (center_heatmap == pooled) & (center_heatmap > threshold)
    scores = jnp.where(is_peak, center_heatmap, 0.0).reshape(-1)
    top_k = min(top_k, H * W)
    vals, idx = jax.lax.top_k(scores, top_k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return jnp.stack([ys, xs], axis=-1), vals


def group_pixels(
    centers: jnp.ndarray,  # [K, 2] (y, x)
    center_scores: jnp.ndarray,  # [K]
    offsets: jnp.ndarray,  # [H, W, 2] (dy, dx) pointing to the center
) -> jnp.ndarray:
    """Assign each pixel the id (1-based) of the nearest valid center after
    applying its predicted offset. Returns [H, W] int32 (0 where no center
    exists at all)."""
    H, W = offsets.shape[:2]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + offsets[..., 0]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + offsets[..., 1]
    loc = jnp.stack([ys, xs], axis=-1).reshape(-1, 1, 2)  # [HW, 1, 2]
    # squared-L2 nearest center (same argmin as the reference's torch.norm)
    d = ((loc - centers[None]) ** 2).sum(-1)  # [HW, K]
    d = jnp.where(center_scores[None] > 0, d, jnp.inf)
    ins_id = jnp.argmin(d, axis=-1).astype(jnp.int32) + 1
    any_center = (center_scores > 0).any()
    return jnp.where(any_center, ins_id.reshape(H, W), 0)


def get_panoptic_segmentation(
    sem_seg: jnp.ndarray,  # [H, W] predicted class ids
    center_heatmap: jnp.ndarray,  # [H, W]
    offsets: jnp.ndarray,  # [H, W, 2]
    thing_ids,  # set/sequence of thing class ids
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
    void_label: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse semantic + instance predictions
    (reference post_processing.py merge_semantic_and_instance:111-163).

    Reference semantics, fixed-shape: each instance takes the most frequent
    thing class among its pixels (majority vote); instance ids are renumbered
    per class (1..n in center order); thing-class pixels grouped to no center
    and stuff regions smaller than stuff_area become ``void_label``.

    Returns (panoptic [H, W] = class*divisor + per-class instance id for
    things, class*divisor for stuff, void_label elsewhere; center scores [K]).
    """
    H, W = sem_seg.shape
    C = 256  # static class-id budget for the vote/area scatters
    thing_ids = sorted(int(t) for t in thing_ids)
    is_thing = jnp.zeros((C,), bool).at[jnp.asarray(thing_ids, jnp.int32)].set(True)
    sem_seg = jnp.clip(sem_seg, 0, C - 1).astype(jnp.int32)
    thing_mask = is_thing[sem_seg]

    centers, scores = find_instance_center(center_heatmap, threshold, nms_kernel, top_k)
    ins_id = group_pixels(centers, scores, offsets)  # [H, W] 1-based
    ins_id = jnp.where(thing_mask, ins_id, 0)

    K = centers.shape[0]
    # majority vote of the semantic class within each instance:
    # votes[k, c] = #pixels with ins_id==k+1 and sem_seg==c (restricted to things)
    flat_ins = ins_id.reshape(-1)
    flat_sem = sem_seg.reshape(-1)
    vote_idx = (flat_ins - 1) * C + flat_sem
    vote_idx = jnp.where(flat_ins > 0, vote_idx, K * C)  # spill bucket
    votes = jnp.zeros((K * C + 1,), jnp.int32).at[vote_idx].add(1)
    votes = votes[: K * C].reshape(K, C)
    occupied = votes.sum(-1) > 0  # [K] center owns at least one thing pixel
    ins_class = jnp.argmax(votes, axis=-1).astype(jnp.int32)  # [K]

    # per-class renumbering (reference class_id_tracker): instance k becomes
    # the 1-based count of occupied same-class centers with index <= k
    same_class = (ins_class[:, None] == ins_class[None, :]) & occupied[None, :]
    upper = jnp.tril(jnp.ones((K, K), bool))  # j <= k
    new_id = (same_class & upper).sum(-1).astype(jnp.int32)  # [K] 1-based

    pan = jnp.where(
        ins_id > 0,
        ins_class[jnp.maximum(ins_id - 1, 0)] * label_divisor
        + new_id[jnp.maximum(ins_id - 1, 0)],
        jnp.where(
            thing_mask,
            # thing-class pixels grouped to no center: VOID (reference
            # initializes pan_seg to void and only pastes voted instances)
            void_label,
            flat_sem.reshape(H, W) * label_divisor,
        ),
    )

    # small stuff regions -> VOID: area per stuff class
    stuff_sem = jnp.where((ins_id == 0) & ~thing_mask, sem_seg, C - 1)
    areas = jnp.zeros((C,), jnp.int32).at[stuff_sem.reshape(-1)].add(1)
    small = areas[sem_seg] < stuff_area
    pan = jnp.where((ins_id == 0) & small & ~thing_mask, void_label, pan)
    return pan, scores


def panoptic_deeplab_postprocess(
    sem_logits,
    center,
    offset,
    image_size,
    thing_ids,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
):
    """Host-side wiring from the model's raw inference outputs to the
    (panoptic_seg, segments_info) pair COCOPanopticEvaluator consumes
    (the role of reference panoptic_seg.py:PanopticDeepLab.inference's
    processed_results loop).

    Args:
        sem_logits: [Hp, Wp, C] padded-frame semantic logits.
        center: [Hp, Wp] (or [Hp, Wp, 1]) center heatmap.
        offset: [Hp, Wp, 2] offset field.
        image_size: (h, w) true image size to crop the padded frame to.
        thing_ids: contiguous ids that are "things".

    Returns:
        (panoptic [h, w] int32 numpy, segments_info list of dicts with
        id / category_id (contiguous) / isthing).
    """
    import numpy as np

    h, w = int(image_size[0]), int(image_size[1])
    sem = jnp.argmax(jnp.asarray(sem_logits)[:h, :w], axis=-1).astype(jnp.int32)
    cen = jnp.asarray(center)
    if cen.ndim == 3:
        cen = cen[..., 0]
    pan, _ = get_panoptic_segmentation(
        sem,
        cen[:h, :w],
        jnp.asarray(offset)[:h, :w],
        thing_ids,
        label_divisor=label_divisor,
        stuff_area=stuff_area,
        threshold=threshold,
        nms_kernel=nms_kernel,
        top_k=top_k,
    )
    pan = np.asarray(pan)
    thing_set = {int(t) for t in thing_ids}
    segments_info = []
    for pid in np.unique(pan):
        if pid < 0:  # VOID (reference void_label = -1)
            continue
        cat = int(pid) // label_divisor
        segments_info.append(
            {
                "id": int(pid),
                "category_id": cat,
                "isthing": cat in thing_set,
                "area": int((pan == pid).sum()),
            }
        )
    return pan, segments_info
