"""Convert detectron2 zoo checkpoints (.pkl state dicts of numpy arrays with
torch names/layouts) into this framework's flax param pytrees.

The analogue of reference detectron2/checkpoint/c2_model_loading.py:208
(align_and_update_state_dicts): a deterministic name mapping from flax scopes
to d2 module paths, plus the layout transposes (torch conv OIHW -> flax HWIO,
torch linear [out,in] -> flax [in,out]).
"""

import logging
from typing import Any, Dict, List, Tuple

import numpy as np

import jax

logger = logging.getLogger(__name__)

__all__ = ["convert_d2_state_dict", "flax_path_to_d2_name"]

# flax auto-names that are implementation details of a wrapper module and
# should be merged into their parent scope
_MERGE_SEGMENTS = ("Conv_", "ConvTranspose_", "Dense_", "BatchNorm_")
# flax norm-module auto-names mapping to the d2 ".norm" child
_NORM_SEGMENTS = ("FrozenBatchNorm2d_", "GroupNorm_", "LayerNorm_", "SyncBatchNorm_", "NaiveSyncBatchNorm_")

_LEAF_RENAMES = {
    "kernel": "weight",
    "scale": "weight",  # flax GroupNorm/LayerNorm scale
    "mean": "running_mean",  # flax nn.BatchNorm batch_stats
    "var": "running_var",
}

_SEGMENT_RENAMES = {}


def _path_entry_str(p) -> str:
    """Stringify one jax key-path entry: DictKey has .key, GetAttrKey has
    .name, SequenceKey has .idx (str(p) would yield '.step'/'[0]' forms)."""
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "name"):
        return str(p.name)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def flax_path_to_d2_name(path: Tuple[str, ...]) -> str:
    """Map a flax param path (tuple of scope names + leaf) to a d2 dotted name."""
    import re

    segs: List[str] = []
    prev = None
    for seg in path[:-1]:
        if any(seg.startswith(mm) for mm in _MERGE_SEGMENTS):
            prev = seg
            continue  # merged into parent
        if any(seg.startswith(mm) for mm in _NORM_SEGMENTS):
            # an auto-named norm module nested inside an explicit "norm"
            # scope (a get_norm factory bound by Conv2d) collapses to ONE
            # d2 "norm" attribute, not "norm.norm"
            if not segs or segs[-1] != "norm":
                segs.append("norm")
            prev = seg
            continue
        if seg == "conv2_norm":  # DeformBottleneckBlock's deform-conv norm
            segs.extend(["conv2", "norm"])
            prev = seg
            continue
        if seg == "cse_embedder":
            # DensePose CSE: our roi_heads attr is cse_embedder, d2's is
            # embedder (reference densepose/modeling/roi_heads/roi_head.py:130);
            # inner embedder_{mesh} / embeddings / features names already match
            segs.append("embedder")
            prev = seg
            continue
        if seg == "head" and prev == "proposal_generator":
            # our RPN field is "head"; d2 names it "rpn_head" (RetinaNet's
            # dense head, by contrast, IS "head" in d2)
            segs.append("rpn_head")
            prev = seg
            continue
        m = re.fullmatch(r"(cls_subnet|bbox_subnet|mask_subnet)(\d+)", seg)
        if m:
            # d2 builds the subnets as Sequential(conv, relu, conv, relu, ...):
            # our conv i sits at Sequential index 2*i (mask_subnet is
            # TensorMask's third tower, arch.py:811-820)
            segs.extend([m.group(1), str(2 * int(m.group(2)))])
            prev = seg
            continue
        if seg == "mask_fuse":
            # TensorMask bipyramid fuse is Sequential(conv, relu)
            # (arch.py:839-844); our single fuse conv is its index 0
            segs.extend(["mask_fuse", "0"])
            prev = seg
            continue
        m = re.fullmatch(r"blocks_(\d+)", seg)
        if m:
            # ViT transformer blocks: d2 uses a ModuleList index
            segs.extend(["blocks", m.group(1)])
            prev = seg
            continue
        # Swin: stage{i}_block{d} -> layers.i.blocks.d ; merge{i} ->
        # layers.i.downsample ; out_norm{i} -> norm{i} ; patch_norm ->
        # patch_embed.norm ; mlp_fc{k} -> mlp.fc{k}
        m = re.fullmatch(r"stage(\d+)_block(\d+)", seg)
        if m:
            segs.extend(["layers", m.group(1), "blocks", m.group(2)])
            prev = seg
            continue
        m = re.fullmatch(r"merge(\d+)", seg)
        if m:
            segs.extend(["layers", m.group(1), "downsample"])
            prev = seg
            continue
        m = re.fullmatch(r"out_norm(\d+)", seg)
        if m:
            segs.append(f"norm{m.group(1)}")
            prev = seg
            continue
        if seg == "patch_norm":
            segs.extend(["patch_embed", "norm"])
            prev = seg
            continue
        m = re.fullmatch(r"mlp_fc(\d+)", seg)
        if m:
            segs.extend(["mlp", f"fc{m.group(1)}"])
            prev = seg
            continue
        if seg == "patch_embed":
            # our patch embed IS the conv; d2 wraps it (PatchEmbed.proj)
            segs.extend(["patch_embed", "proj"])
            prev = seg
            continue
        m = re.fullmatch(r"(up4_deconv1|up4_norm|up4_deconv2|up2_deconv|lateral|output)_(\d+)", seg)
        if m:
            # SimpleFeaturePyramid: d2 names each scale stage simfp_{stage}
            # with a Sequential index (vit.py:410-455). Index mapping assumes
            # the canonical ViTDet scale set (4, 2, 1, 0.5) on a stride-16
            # backbone -> stages 2..5.
            idx = int(m.group(2))
            stage = idx + 2
            kind = m.group(1)
            seq = {
                0: {"up4_deconv1": 0, "up4_norm": 1, "up4_deconv2": 3, "lateral": 4, "output": 5},
                1: {"up2_deconv": 0, "lateral": 1, "output": 2},
                2: {"lateral": 0, "output": 1},
                3: {"lateral": 1, "output": 2},  # maxpool occupies index 0
            }[idx][kind]
            segs.extend([f"simfp_{stage}", str(seq)])
            prev = seg
            continue
        # RegNet: s{i}_b{j} -> s{i}.b{j+1} (d2 numbers blocks from 1); the
        # bottleneck transform members live under "f" with sibling _bn norms
        # (fixed up on the final name below)
        m = re.fullmatch(r"s(\d+)_b(\d+)", seg)
        if m:
            segs.extend([f"s{m.group(1)}", f"b{int(m.group(2)) + 1}"])
            prev = "__regnet_block__"
            continue
        if prev == "__regnet_block__" and seg in ("a", "b", "c", "se"):
            segs.extend(["f", seg])
            prev = seg
            continue
        m = re.fullmatch(r"f_ex_(\d+)", seg)
        if m:
            segs.extend(["f_ex", m.group(1)])
            prev = seg
            continue
        m = re.fullmatch(r"(p\d+)_conv(\d+)", seg)
        if m and prev in ("sem_seg_head", "decoder", "coarse_sem_seg_head"):
            # SemSegFPNHead scale heads (and the DensePose Decoder, same
            # structure): d2 builds Sequential(conv, up, conv, up, ...) per
            # feature — conv k sits at index 2*k
            segs.extend([m.group(1), str(2 * int(m.group(2)))])
            prev = seg
            continue
        if seg == "coarse_head" and prev == "sem_seg_head":
            # PointRend semantic: our coarse_head attr is the reference's
            # coarse_sem_seg_head (point_rend/semantic_seg.py:30)
            segs.append("coarse_sem_seg_head")
            prev = "coarse_sem_seg_head"
            continue
        # DeepLabV3+ decoder stages (reference deeplab/semantic_seg.py:96-170):
        # {feat}_project -> decoder.{feat}.project_conv ; {feat}_fuse{k} ->
        # decoder.{feat}.fuse_conv.{k}. The ASPP stage keeps our "aspp" name
        # here; _alt_d2_names tries decoder.<feat>.project_conv for it.
        m = re.fullmatch(r"(\w+?)_project", seg)
        if m and prev in ("sem_seg_head", "ins_embed_head"):
            segs.extend(["decoder", m.group(1), "project_conv"])
            prev = seg
            continue
        m = re.fullmatch(r"(\w+?)_fuse(\d+)", seg)
        if m and prev in ("sem_seg_head", "ins_embed_head"):
            segs.extend(["decoder", m.group(1), "fuse_conv", m.group(2)])
            prev = seg
            continue
        m = re.fullmatch(r"(\w+?)_fuse", seg)
        if m and prev in ("sem_seg_head", "ins_embed_head"):
            # dsconv variant: fuse is a single DepthwiseSeparableConv2d, not
            # a Sequential — no index (reference deeplab/semantic_seg.py:150)
            segs.extend(["decoder", m.group(1), "fuse_conv"])
            prev = seg
            continue
        # HRNet / HRFPN (reference densepose/modeling/hrnet.py, hrfpn.py):
        # flax scope names mirror the torch ModuleList paths with "_" for "."
        m = re.fullmatch(
            r"(layer1|transition\d|stage\d|branches|fuse_layers|downsample|"
            r"interp_conv|reduction_pooling_conv|fpn_conv)((?:_\d+)+)",
            seg,
        )
        if m:
            segs.append(m.group(1))
            segs.extend(m.group(2).strip("_").split("_"))
            prev = seg
            continue
        # DensePoseDeepLabHead ASPP (reference densepose/modeling/roi_heads/
        # deeplab.py): Sequential-indexed convs/GNs under an "ASPP" child
        m = re.fullmatch(r"convs_(\d+)_(\d+)", seg)
        if m and prev == "densepose_head":
            segs.extend(["ASPP", "convs", m.group(1), m.group(2)])
            prev = seg
            continue
        if seg == "project_0" and prev == "densepose_head":
            segs.extend(["ASPP", "project", "0"])
            prev = seg
            continue
        m = re.fullmatch(r"(head|center_head|offset_head)(\d)", seg)
        if m and prev in ("sem_seg_head", "ins_embed_head"):
            # Panoptic-DeepLab head towers: d2 builds nn.Sequential(conv, conv)
            segs.extend([m.group(1), m.group(2)])
            prev = seg
            continue
        if prev == "aspp":
            # d2 ASPP internals (layers/aspp.py:60-110): convs.0 = 1x1,
            # convs.{1+i} = atrous i, convs.{1+N} = image pooling Sequential
            # (pool, conv); project keeps its name
            if seg == "conv1x1":
                segs.extend(["convs", "0"])
                prev = seg
                continue
            m = re.fullmatch(r"atrous(\d+)", seg)
            if m:
                segs.extend(["convs", str(1 + int(m.group(1)))])
                prev = seg
                continue
            if seg == "pool_conv":
                segs.extend(["convs", "4", "1"])
                prev = seg
                continue
        # res2_0 -> res2.0 style stage blocks; box_head_0 -> box_head.0
        # (cascade per-stage tuple fields flax-name with an _i suffix where
        # d2 uses a ModuleList index)
        parts = seg.rsplit("_", 1)
        if len(parts) == 2 and parts[1].isdigit() and (
            parts[0].startswith("res") or parts[0] in ("box_head", "box_predictor")
        ):
            segs.extend([parts[0], parts[1]])
            prev = seg
            continue
        segs.append(_SEGMENT_RENAMES.get(seg, seg))
        prev = seg
    leaf = _LEAF_RENAMES.get(path[-1], path[-1])
    # DeformBottleneckBlock custom param
    if leaf == "conv2_kernel":
        segs.append("conv2")
        leaf = "weight"
    name = ".".join(segs + [leaf])
    # RegNet structural fixups: d2 puts the transform norms as SIBLINGS with
    # an _bn suffix, the shortcut norm as "bn", and wraps the stem conv
    name = re.sub(r"\.f\.([abc])\.norm\.", r".f.\1_bn.", name)
    name = re.sub(r"(\.b\d+)\.proj\.norm\.", r"\1.bn.", name)
    name = re.sub(r"(^|\.)stem\.weight$", r"\1stem.conv.weight", name)
    name = re.sub(r"(^|\.)stem\.norm\.", r"\1stem.bn.", name)
    return name


def _alt_d2_names(name: str):
    """Alternate candidate names tried when the primary mapping misses.

    Dense-head subnets: without norm, d2's Sequential is (conv, relu)*N and
    our conv i maps to index 2i (the primary rule); WITH norm it is
    (conv, norm, relu)*N, so conv i sits at 3i and its norm at 3i+1."""
    import re

    if ".aspp." in name:
        # DeepLabV3+ nests its ASPP as decoder.<deepest-feature>.project_conv
        # (plain DeepLabV3 keeps it as .aspp., the primary mapping)
        for f in ("res5", "res4", "res3", "p5"):
            yield name.replace(".aspp.", f".decoder.{f}.project_conv.")
        return
    # PointRend (reference mask_head.py PointRendMaskHead): the coarse
    # ConvFCHead lives at roi_heads.mask_head.coarse_head and the point head
    # at roi_heads.mask_head.point_head — our flax scopes are mask_head /
    # point_head directly
    if ".mask_head." in name and ".coarse_head." not in name:
        yield name.replace(".mask_head.", ".mask_head.coarse_head.")
    if ".point_head." in name and ".mask_head." not in name:
        yield name.replace(".point_head.", ".mask_head.point_head.")
    # Implicit PointRend: the parameter head nests inside the mask head
    # (reference point_rend/mask_head.py ImplicitPointRendMaskHead)
    if ".parameter_head." in name and ".mask_head." not in name:
        yield name.replace(".parameter_head.", ".mask_head.parameter_head.")
    # multi-conv RPN head: the reference wraps >1 convs in an nn.Sequential
    # named "conv" (rpn.py StandardRPNHead), so convN lives at conv.convN
    m = re.search(r"rpn_head\.conv(\d+)\.", name)
    if m:
        yield name.replace(f"rpn_head.conv{m.group(1)}.", f"rpn_head.conv.conv{m.group(1)}.")
    m = re.search(r"(cls_subnet|bbox_subnet)\.(\d+)\.norm\.(\w+)$", name)
    if m and int(m.group(2)) % 2 == 0:
        i = int(m.group(2)) // 2
        yield re.sub(
            r"(cls_subnet|bbox_subnet)\.\d+\.norm\.(\w+)$",
            rf"\g<1>.{3 * i + 1}.\g<2>",
            name,
        )
        return
    m = re.search(r"(cls_subnet|bbox_subnet)\.(\d+)\.(\w+)$", name)
    if m and int(m.group(2)) % 2 == 0:
        i = int(m.group(2)) // 2
        yield re.sub(
            r"(cls_subnet|bbox_subnet)\.\d+\.(\w+)$", rf"\g<1>.{3 * i}.\g<2>", name
        )


def _to_flax_layout(value: np.ndarray, target_shape, conv_transpose: bool = False) -> np.ndarray:
    """Transpose a torch-layout array into the flax layout expected by
    target_shape, verifying shapes."""
    value = np.asarray(value)
    # layout rules come FIRST: a square torch linear [out, in] has the same
    # shape as the flax [in, out] target, and a shapes-equal early return
    # would silently skip the transpose (loading W instead of W^T)
    if value.ndim == 2:
        cand = value.T
        if cand.shape == tuple(target_shape):
            return cand
    if value.ndim == 4:
        # torch conv is OIHW, torch conv-TRANSPOSE is IOHW; for square
        # kernels both permutations match the target shape, so the caller
        # must say which module kind owns the leaf. Additionally torch's
        # ConvTranspose2d applies the kernel spatially FLIPPED relative to
        # flax's ConvTranspose (verified bit-exact in
        # tests/test_checkpoint.py::test_convtranspose_layout) — flip h/w.
        if conv_transpose:
            cand = value.transpose(2, 3, 0, 1)[::-1, ::-1]
            if cand.shape == tuple(target_shape):
                return np.ascontiguousarray(cand)
        for perm in [(2, 3, 1, 0), (2, 3, 0, 1)]:
            cand = value.transpose(*perm)
            if cand.shape == tuple(target_shape):
                return cand
    if value.ndim == 3 and value.shape[-1] == 1:
        # torch Conv1d(kernel_size=1) used as a pointwise FC (PointRend's
        # point head): [out, in, 1] -> flax Dense [in, out]
        cand = value[:, :, 0].T
        if cand.shape == tuple(target_shape):
            return cand
    if value.ndim <= 1 and value.shape == tuple(target_shape):
        return value
    # identity for non-linear tables (rel_pos [2S-1, head_dim], pos_embed
    # [1, N, D], ...): safe because a NON-square torch linear can only reach
    # here when its transpose did NOT match, and the ambiguous square case
    # is resolved by the transpose-first rule above
    if value.ndim in (2, 3) and value.shape == tuple(target_shape):
        return value
    raise ValueError(f"Cannot map array of shape {value.shape} to {tuple(target_shape)}")


def convert_d2_state_dict(state_dict: Dict[str, Any], params) -> Tuple[Any, str]:
    """Convert a d2-style flat state dict into the given flax param pytree.

    Args:
        state_dict: torch-name -> numpy array (as found in d2 .pkl files).
        params: the target flax variables pytree (provides paths/shapes).

    Returns:
        (new_params, report string). Unmatched target leaves keep their
        current (initialized) values; mismatches are reported, mirroring the
        reference's logging of incompatible shapes
        (detection_checkpoint.py:128-142).
    """
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    # dense-head tower layout probe: (conv, relu)*N puts convs at even
    # indices and index 1 holds no params; (conv, norm, relu)*N (FCOS /
    # SyncBN-head RetinaNet) has a norm at index 1 — remap our conv i from
    # the primary 2i to 3i (and norms to 3i+1) up front so biases can't be
    # claimed by the shape-compatible norm at 2i
    import re as _re

    _normed_towers = any(
        _re.search(r"(cls_subnet|bbox_subnet)\.1\.weight$", k) for k in state_dict
    )

    def _remap_subnet(name: str) -> str:
        if not _normed_towers:
            return name
        m = _re.search(r"(cls_subnet|bbox_subnet)\.(\d+)(\.norm)?\.(\w+)$", name)
        if not m or int(m.group(2)) % 2:
            return name
        i = int(m.group(2)) // 2
        new_idx = 3 * i + (1 if m.group(3) else 0)
        return _re.sub(
            r"(cls_subnet|bbox_subnet)\.\d+(\.norm)?\.(\w+)$",
            rf"\g<1>.{new_idx}.\g<3>",
            name,
        )

    used = set()
    missing: List[str] = []
    mismatched: List[str] = []
    new_leaves = []
    for path, leaf in flat:
        keys = tuple(_path_entry_str(p) for p in path)
        # drop flax collection roots ('params' / 'batch_stats') wherever they
        # appear — the target may be a bare variables dict or nested inside a
        # holder object whose attr paths come first
        name_keys = tuple(
            k for k in keys if k not in ("params", "batch_stats", "frozen", "buffers")
        )
        d2_name = _remap_subnet(flax_path_to_d2_name(name_keys))
        is_deconv = any(k.startswith("ConvTranspose") for k in keys)
        # try the primary name first, then alternates — including when the
        # primary EXISTS but with an incompatible shape (e.g. FCOS's GN'd
        # subnets: our conv i maps primarily to Sequential index 2i, which in
        # a (conv, norm, relu) tower is a real key holding the norm weight;
        # the 3i alternate is the right one)
        present = [n for n in (d2_name, *_alt_d2_names(d2_name)) if n in state_dict]
        loaded = False
        first_err = None
        for cand in present:
            try:
                arr = _to_flax_layout(state_dict[cand], leaf.shape, conv_transpose=is_deconv)
            except ValueError as e:
                first_err = first_err or f"{cand}: {e}"
                continue
            new_leaves.append(arr.astype(np.asarray(leaf).dtype))
            used.add(cand)
            loaded = True
            break
        if not loaded:
            if present:
                mismatched.append(first_err)
            else:
                missing.append(d2_name)
            new_leaves.append(leaf)

    unused = sorted(set(state_dict.keys()) - used)
    # the reference ignores pixel_mean/std and anchor buffers;
    # num_batches_tracked is torch-BN bookkeeping with no analogue here
    unused = [
        u
        for u in unused
        if "pixel_mean" not in u
        and "pixel_std" not in u
        and "anchors" not in u
        and "cell_anchors" not in u
        and not u.endswith("num_batches_tracked")
        # fed-loss class weights are a derived buffer (reference
        # fast_rcnn.py:250 registers get_fed_loss_cls_weights' output); we
        # recompute them from the vendored LVIS count table at config time
        and not u.endswith("fed_loss_cls_weights")
        # swin's relative_position_index is a precomputed constant lookup
        # (reference swin.py:129-139 registers it as a buffer); ours is
        # rebuilt from window_size at trace time
        and not u.endswith("relative_position_index")
    ]

    report_lines = [f"Loaded {len(used)}/{len(flat)} parameter tensors from d2 checkpoint."]
    if missing:
        report_lines.append(f"Randomly initialized (not found in checkpoint): {missing[:20]}{'...' if len(missing) > 20 else ''}")
    if mismatched:
        report_lines.append(f"Shape mismatches: {mismatched}")
    if unused:
        report_lines.append(f"Unused checkpoint keys: {unused[:20]}{'...' if len(unused) > 20 else ''}")

    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return new_params, "\n".join(report_lines)
