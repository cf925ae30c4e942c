"""HRNet (PoseHigherResolutionNet) backbone
(reference projects/DensePose/densepose/modeling/hrnet.py:26-476).

Multi-resolution parallel conv branches exchanged through fuse layers: a
2-conv stride-4 stem, a 4-Bottleneck layer1, then three stages of
HighResolutionModules whose branch/fuse structure comes from
cfg.MODEL.HRNET.STAGE{2,3,4}. Outputs the 4 final branches as p1..p4
(strides 4..32). All BNs are running-stats BatchNorm (torch momentum 0.1).

Flax scope names mirror the torch attribute paths with "_" for "." (e.g.
``layer1_0``, ``stage3_1``, ``branches_2_0``, ``fuse_layers_0_1_0``,
``transition2_2_0_0``); the checkpoint converter splits the trailing indices
back into d2 Sequential/ModuleList indices.
"""

from typing import Tuple

from flax import linen as nn

from detectron2_tpu.layers.batch_norm import BatchNorm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone import BACKBONE_REGISTRY, Backbone

__all__ = ["PoseHigherResolutionNet", "build_pose_hrnet_backbone"]


class _HRBasicBlock(nn.Module):
    """BasicBlock (reference hrnet.py:31-61), expansion 1."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = Conv2d(self.planes, 3, strides=self.stride, padding=1, use_bias=False, name="conv1")(
            x, train=train
        )
        y = nn.relu(BatchNorm(self.planes, name="bn1")(y, train=train))
        y = Conv2d(self.planes, 3, padding=1, use_bias=False, name="conv2")(y, train=train)
        y = BatchNorm(self.planes, name="bn2")(y, train=train)
        if self.downsample:
            res = Conv2d(self.planes, 1, strides=self.stride, use_bias=False, name="downsample_0")(
                x, train=train
            )
            res = BatchNorm(self.planes, name="downsample_1")(res, train=train)
        return nn.relu(y + res)


class _HRBottleneck(nn.Module):
    """Bottleneck (reference hrnet.py:63-99), expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        res = x
        y = Conv2d(self.planes, 1, use_bias=False, name="conv1")(x, train=train)
        y = nn.relu(BatchNorm(self.planes, name="bn1")(y, train=train))
        y = Conv2d(self.planes, 3, strides=self.stride, padding=1, use_bias=False, name="conv2")(
            y, train=train
        )
        y = nn.relu(BatchNorm(self.planes, name="bn2")(y, train=train))
        y = Conv2d(out_ch, 1, use_bias=False, name="conv3")(y, train=train)
        y = BatchNorm(out_ch, name="bn3")(y, train=train)
        if self.downsample:
            res = Conv2d(out_ch, 1, strides=self.stride, use_bias=False, name="downsample_0")(
                x, train=train
            )
            res = BatchNorm(out_ch, name="downsample_1")(res, train=train)
        return nn.relu(y + res)


_BLOCKS = {"BASIC": (_HRBasicBlock, 1), "BOTTLENECK": (_HRBottleneck, 4)}


class _HighResolutionModule(nn.Module):
    """HighResolutionModule (reference hrnet.py:101-274): per-branch block
    towers, then a full fuse mesh — j>i upsamples (1x1 conv + BN + nearest
    x2^(j-i)), j<i downsamples (chains of stride-2 3x3 conv+BN(+relu))."""

    block: str
    num_blocks: Tuple[int, ...]
    in_channels: Tuple[int, ...]  # per-branch input channels
    num_channels: Tuple[int, ...]  # per-branch block width (pre-expansion)
    multi_scale_output: bool = True

    @nn.compact
    def __call__(self, xs, train: bool = False):
        import jax

        block_cls, expansion = _BLOCKS[self.block]
        nb = len(self.num_channels)
        out_channels = [c * expansion for c in self.num_channels]

        ys = []
        for b in range(nb):
            y = xs[b]
            for k in range(self.num_blocks[b]):
                need_ds = k == 0 and self.in_channels[b] != out_channels[b]
                y = block_cls(
                    planes=self.num_channels[b], downsample=need_ds, name=f"branches_{b}_{k}"
                )(y, train=train)
            ys.append(y)

        if nb == 1:
            return ys

        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(nb):
                if j == i:
                    z = ys[j]
                elif j > i:
                    z = Conv2d(
                        out_channels[i], 1, use_bias=False, name=f"fuse_layers_{i}_{j}_0"
                    )(ys[j], train=train)
                    z = BatchNorm(out_channels[i], name=f"fuse_layers_{i}_{j}_1")(z, train=train)
                    B, H, W, C = z.shape
                    s = 2 ** (j - i)
                    # nn.Upsample(mode="nearest")
                    z = jax.image.resize(z, (B, H * s, W * s, C), method="nearest")
                    # crop to the running sum's spatial size (reference :265)
                    th, tw = ys[i].shape[1], ys[i].shape[2]
                    z = z[:, :th, :tw]
                else:
                    z = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_channels[i] if last else out_channels[j]
                        z = Conv2d(
                            ch, 3, strides=2, padding=1, use_bias=False,
                            name=f"fuse_layers_{i}_{j}_{k}_0",
                        )(z, train=train)
                        z = BatchNorm(ch, name=f"fuse_layers_{i}_{j}_{k}_1")(z, train=train)
                        if not last:
                            z = nn.relu(z)
                    th, tw = ys[i].shape[1], ys[i].shape[2]
                    z = z[:, :th, :tw]
                acc = z if acc is None else acc + z
            fused.append(nn.relu(acc))
        return fused


class PoseHigherResolutionNet(Backbone):
    """The HRNet trunk (reference hrnet.py:277-471)."""

    stage_cfgs: Tuple[dict, ...] = ()  # (stage2, stage3, stage4) dicts

    @classmethod
    def from_config(cls, cfg):
        stages = []
        for s in (cfg.MODEL.HRNET.STAGE2, cfg.MODEL.HRNET.STAGE3, cfg.MODEL.HRNET.STAGE4):
            stages.append(
                dict(
                    num_modules=int(s.NUM_MODULES),
                    block=str(s.BLOCK),
                    num_blocks=tuple(int(x) for x in s.NUM_BLOCKS),
                    num_channels=tuple(int(x) for x in s.NUM_CHANNELS),
                )
            )
        return cls(stage_cfgs=tuple(stages))

    def output_shape(self):
        s4 = self.stage_cfgs[2]
        return {
            f"p{i + 1}": ShapeSpec(channels=s4["num_channels"][i], stride=4 * 2**i)
            for i in range(len(s4["num_channels"]))
        }

    @property
    def size_divisibility(self):
        return 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: two stride-2 3x3 convs
        y = Conv2d(64, 3, strides=2, padding=1, use_bias=False, name="conv1")(x, train=train)
        y = nn.relu(BatchNorm(64, name="bn1")(y, train=train))
        y = Conv2d(64, 3, strides=2, padding=1, use_bias=False, name="conv2")(y, train=train)
        y = nn.relu(BatchNorm(64, name="bn2")(y, train=train))

        # layer1: 4 Bottlenecks at width 64 (256 out)
        for k in range(4):
            y = _HRBottleneck(planes=64, downsample=k == 0, name=f"layer1_{k}")(y, train=train)

        prev_channels = [256]
        ys = [y]
        for si, scfg in enumerate(self.stage_cfgs):
            block_cls, expansion = _BLOCKS[scfg["block"]]
            cur_channels = [c * expansion for c in scfg["num_channels"]]
            tname = f"transition{si + 1}"
            # transition (reference :343-384)
            xs = []
            for i in range(len(cur_channels)):
                if i < len(prev_channels):
                    if cur_channels[i] != prev_channels[i]:
                        z = Conv2d(
                            cur_channels[i], 3, padding=1, use_bias=False, name=f"{tname}_{i}_0"
                        )(ys[i], train=train)
                        z = BatchNorm(cur_channels[i], name=f"{tname}_{i}_1")(z, train=train)
                        xs.append(nn.relu(z))
                    else:
                        xs.append(ys[i])
                else:
                    # reference forward feeds y_list[-1] (the deepest branch)
                    z = ys[len(prev_channels) - 1]
                    for j in range(i + 1 - len(prev_channels)):
                        last = j == i - len(prev_channels)
                        ch = cur_channels[i] if last else prev_channels[-1]
                        z = Conv2d(
                            ch, 3, strides=2, padding=1, use_bias=False,
                            name=f"{tname}_{i}_{j}_0",
                        )(z, train=train)
                        z = BatchNorm(ch, name=f"{tname}_{i}_{j}_1")(z, train=train)
                        z = nn.relu(z)
                    xs.append(z)

            # stage modules
            in_ch = list(cur_channels)
            for m in range(scfg["num_modules"]):
                xs = _HighResolutionModule(
                    block=scfg["block"],
                    num_blocks=scfg["num_blocks"],
                    in_channels=tuple(in_ch),
                    num_channels=scfg["num_channels"],
                    multi_scale_output=True,
                    name=f"stage{si + 2}_{m}",
                )(xs, train=train)
                in_ch = [c * expansion for c in scfg["num_channels"]]
            ys = xs
            prev_channels = list(in_ch)

        return {f"p{i + 1}": ys[i] for i in range(len(ys))}


@BACKBONE_REGISTRY.register()
def build_pose_hrnet_backbone(cfg, input_shape=None):
    return PoseHigherResolutionNet.from_config(cfg)
