"""UAVSal: the full UAV-video saliency model + the ablation zoo.

TPU-native re-design of the reference model graph (reference: model.py:254-375
and ablations :558-1076). Data layout differences from the reference:

- Activations are NHWC. Stateful models take (V, S, H, W, 3): V parallel
  videos (the data-parallel axis; V=1 == the reference), S frames per video
  where S = batch_size * time_dims flattened exactly like the reference's
  B·D dimension (the recurrence runs over all S frames of one video,
  reference: model.py:367-369). Stateless ablation models keep the flat
  (S, H, W, 3) layout.
- Priors are passed as single maps (Ho, Wo, 8) / (Ho, Wo, 20) and processed
  ONCE per call, then broadcast across frames. The reference convolves
  per-frame copies (model.py:349-353) — identical math (the maps are
  frame-constant, and BatchNorm statistics over identical copies equal the
  single-copy statistics), at 1/S the FLOPs.
- The stateful recurrence is explicit: `apply(..., x, priors, state)` returns
  `(saliency, new_state)`; state is reset per video and `stop_gradient`-ed at
  clip boundaries by the trainer (TBPTT, reference: Demo_Train_Test.py:144).

Reference-compat quirk flags (see SURVEY.md):
- `compat_cxt_tile=True` reproduces the reference's t-major
  `cb_cxt.repeat(time_dims, 1, 1, 1)` tiling (model.py:361), which
  misaligns context with frames when batch_size > 1. Set False for the
  aligned variant.
- `TeConvSub.diff_group` (in stblock.py) likewise defaults to the
  reference's whole-batch frame differences; with V>1 it is bounded to the
  per-video sequence so differences never cross videos.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import ConvBNAct, DWBlock
from ..ops.resize import resize_bilinear_align_corners
from .recurrent import ConvLSTM, ConvTWA
from .srfnet import SRFNet
from .stblock import STBlock, STBlockS2T, STBlockSS2T, STBlockT2S, STC23D, STC3D, TeConvSub

_FAN_OUT = dict(kernel_init_kwargs={"mode": "fan_out"})

NB_GAUSSIAN = 8
NB_OB = 20
CB_OUPLANES = (64, 64, 64)

ST_TYPES = {
    "st": STBlock,
    "s2t": STBlockS2T,
    "t2s": STBlockT2S,
    "s_s2t": STBlockSS2T,
}


class MultiPriors(nn.Module):
    """MP-Net prior fusion (reference: model.py:281-324 init, :346-365 forward).

    Takes trunk features (S, Ho, Wo, planes) plus the static prior maps and
    returns the prior-fused features. Prior streams use the reference's
    default kaiming fan_in init (init_weights with no mode kwarg,
    model.py:297/306/315).
    """

    planes: int = 256
    time_dims: int = 5
    bias_type: Sequence[int] = (1, 1, 1)
    compat_cxt_tile: bool = True

    @nn.compact
    def __call__(self, x, gauss_prior, ob_prior, train: bool = False):
        use_gauss, use_ob, use_cxt = [bool(b) for b in self.bias_type]
        if not (use_gauss or use_ob or use_cxt):
            return x

        s, ho, wo, c = x.shape
        cb_fu = []

        # Eval mode runs the prior convs ONCE and broadcasts (1/S FLOPs,
        # identical outputs). Train mode runs them on the S frame-copies the
        # reference feeds (model.py:349-353): batch statistics over copies
        # are copy-count-invariant, but torch's running-var EMA applies the
        # unbiased (n/(n-1)) correction with n = S*Ho*Wo — parity of the
        # stored stats requires the same batch size. The prior streams are
        # tiny (<<1% of trunk FLOPs), so this costs nothing measurable.
        def _stream(prior):
            p = prior[None]
            return jnp.broadcast_to(p, (s,) + prior.shape) if train else p

        if use_gauss:
            g = _stream(gauss_prior)  # (1|S, Ho, Wo, 8)
            g = DWBlock(CB_OUPLANES[0], 3, name="gauss_cb_layer_0")(g, train)
            g = DWBlock(CB_OUPLANES[0], 3, name="gauss_cb_layer_1")(g, train)
            cb_fu.append(g)  # (1|S, Ho, Wo, 64)

        if use_ob:
            o = _stream(ob_prior)  # (1|S, Ho, Wo, 20)
            o = DWBlock(CB_OUPLANES[1], 3, name="ob_cb_layer_0")(o, train)
            o = DWBlock(CB_OUPLANES[1], 3, name="ob_cb_layer_1")(o, train)
            cb_fu.append(o)  # (1|S, Ho, Wo, 64)

        if use_cxt:
            t = self.time_dims
            groups = s // t
            x_cb = x.reshape(groups, t, ho, wo, c).sum(axis=1)  # (G, Ho, Wo, C)
            cxt = DWBlock(CB_OUPLANES[2], 3, stride=2, name="cxt_cb_prior_0")(x_cb, train)
            cxt = DWBlock(CB_OUPLANES[2], 3, stride=2, name="cxt_cb_prior_1")(cxt, train)
            cxt = resize_bilinear_align_corners(cxt, ho, wo)
            if train:
                if self.compat_cxt_tile:
                    # reference: cb_cxt.repeat(time_dims,1,1,1) — t-major tiling
                    cxt = jnp.tile(cxt, (t, 1, 1, 1))
                else:
                    cxt = jnp.repeat(cxt, t, axis=0)  # group-major (frame-aligned)
            cb_fu.append(cxt)

        # Every prior stream is constant within a time_dims window, so the
        # fused-prior conv has only G = S/time_dims distinct inputs (1 with
        # the context stream off). Eval-mode BN is pointwise, so running
        # fucb on the distinct rows and tiling AFTER is exact — and skips
        # 1 - 1/time_dims of its FLOPs plus the full-S expand intermediate's
        # HBM round trip (~660 MB/step at S=80, 360x640). Train mode keeps
        # the reference's full-S batch: the running-stat EMA's unbiased
        # n/(n-1) correction depends on the batch size the reference used.
        b0 = s if train else (groups if use_cxt else 1)
        cb = jnp.concatenate(
            [jnp.broadcast_to(p, (b0,) + p.shape[1:]) for p in cb_fu], axis=-1
        )
        cb_last = self.planes // 4
        x_cb = DWBlock(cb_last, 3, name="fucb_layer")(cb, train)
        if b0 != s:
            if use_cxt and self.compat_cxt_tile:
                x_cb = jnp.tile(x_cb, (self.time_dims, 1, 1, 1))
            elif use_cxt:
                x_cb = jnp.repeat(x_cb, self.time_dims, axis=0)
            else:
                x_cb = jnp.broadcast_to(x_cb, (s,) + x_cb.shape[1:])
        x = DWBlock(self.planes, 3, name="fucbst_layer")(
            jnp.concatenate([x, x_cb], axis=-1), train
        )
        return x


class _Trunk(nn.Module):
    """Shared trunk: SRF-Net -> N spatial-temporal blocks -> fuse dwBlock.

    Operates on a flattened (N, H, W, 3) frame batch. `diff_group` bounds the
    temporal-difference span (per-video sequence length when several videos
    are flattened together; None == reference whole-batch behavior).
    """

    cnn_type: str = "mobilenet_v2"
    planes: int = 256
    time_dims: int = 5
    num_stblock: int = 2
    st_type: str = "st"
    st_block_cls: Optional[type] = None
    diff_group: Optional[int] = None
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SRFNet(self.cnn_type, last_channel=self.planes,
                   s2d_stem=self.s2d_stem, name="sfnet")(x, train)
        block = self.st_block_cls or ST_TYPES[self.st_type]
        if block in (STC3D, STC23D):
            kw = {}
        else:
            kw = {"reduction": self.planes // 32, "diff_group": self.diff_group}
        for i in range(self.num_stblock):
            x = block(
                planes=self.planes,
                time_dims=self.time_dims,
                res_connect=True,
                name=f"st_layer_{i}",
                **kw,
            )(x, train)
        x = DWBlock(self.planes, 3, name="fust_layer", **_FAN_OUT)(x, train)
        return x


class UAVSal(nn.Module):
    """The full model: trunk -> MP-Net -> ConvTWA -> 1-ch head -> sigmoid
    (reference: model.py:254-375).

    __call__(x, gauss_prior, ob_prior, state) -> (saliency, new_state)
      x           : (V, S, H, W, 3) normalized frames — V parallel videos
                    (the data-parallel axis; V=1 matches the reference),
                    S frames each with S % time_dims == 0
      gauss_prior : (H//8, W//8, 8)  or None when bias_type[0] == 0
      ob_prior    : (H//8, W//8, 20) or None when bias_type[1] == 0
      state       : (V, H//8, W//8, planes) carried TWA hidden
                    (zeros at each video start; stop-gradient at clip
                    boundaries is the trainer's job)

    TPU dataflow: the conv trunk runs on the flattened (V*S) frame batch —
    one large conv/BN batch (in train mode this is global-batch BN across
    all videos; the reference's single-video case is unchanged). The
    recurrence vmaps over V: sequential in S, parallel across videos, so DP
    sharding of V keeps every chip's MXU busy during the scan.
    """

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    bias_type: Sequence[int] = (1, 1, 1)
    planes: int = 256
    compat_cxt_tile: bool = True
    twa_pallas: Optional[bool] = None  # None=auto: Pallas TWA whenever supported (TPU+bf16)
    s2d_stem: bool = False  # exact space-to-depth stem reparametrization

    def init_state(self, height: int, width: int, n_videos: int = 1, dtype=jnp.float32):
        """Zero TWA state for inputs of (height, width) pixels."""
        return jnp.zeros((n_videos, height // 8, width // 8, self.planes), dtype)

    @nn.compact
    def __call__(self, x, gauss_prior, ob_prior, state, train: bool = False):
        v, s, h, w, c = x.shape
        x = x.reshape(v * s, h, w, c)

        x = _Trunk(
            self.cnn_type,
            self.planes,
            self.time_dims,
            self.num_stblock,
            diff_group=s if v > 1 else None,  # V=1: reference whole-batch diffs
            s2d_stem=self.s2d_stem,
            name="trunk",
        )(x, train)
        x = MultiPriors(
            self.planes,
            self.time_dims,
            self.bias_type,
            # the reference's t-major context tile is only meaningful for a
            # single video; with V>1 it would leak context across videos
            self.compat_cxt_tile and v == 1,
            name="mp",
        )(x, gauss_prior, ob_prior, train)

        ho, wo = x.shape[1], x.shape[2]
        x = x.reshape(v, s, ho, wo, self.planes)
        # batched ConvTWA: sequential in S, parallel over V. Auto-selects the
        # fused VMEM-resident Pallas scan (ops/pallas_twa.py, TPU + bf16,
        # long steps) vs the XLA scan; twa_pallas=True/False forces a path
        rnn = ConvTWA(self.planes, 3, use_bias=False,
                      use_pallas=self.twa_pallas, name="rnn")
        x, new_state = rnn(x, state)
        x = x.reshape(v * s, ho, wo, self.planes)

        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out).reshape(v, s, ho, wo, 1), new_state


class UAVSalSpConv(nn.Module):
    """Sp-Net ablation: plain dwBlocks for the ST stage (reference: model.py:582-620)."""

    cnn_type: str = "mobilenet_v2"
    num_stblock: int = 2
    planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SRFNet(self.cnn_type, last_channel=self.planes, name="sfnet")(x, train)
        for i in range(self.num_stblock):
            x = DWBlock(self.planes, 3, res_connect=True, name=f"st_layer_{i}", **_FAN_OUT)(
                x, train
            )
        x = DWBlock(self.planes, 3, name="fust_layer", **_FAN_OUT)(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalTeConv(nn.Module):
    """Te-Net ablation: teConv-only ST stage (reference: model.py:622-662).

    `diff_group` bounds the temporal differences per video when several
    videos are flattened into the batch (ZooModelAdapter sets it for V>1);
    None keeps the reference whole-batch behavior."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    planes: int = 256
    diff_group: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SRFNet(self.cnn_type, last_channel=self.planes, name="sfnet")(x, train)
        for i in range(self.num_stblock):
            x = TeConvSub(
                self.planes,
                self.time_dims,
                reduction=self.planes // 32,
                res_connect=True,
                diff_group=self.diff_group,
                name=f"st_layer_{i}",
            )(x, train)
        x = DWBlock(self.planes, 3, name="fust_layer", **_FAN_OUT)(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalSTBlocks(nn.Module):
    """ST-Net ablation (reference: model.py:666-705). Returns (out, features).

    `diff_group`: see UAVSalTeConv."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    planes: int = 256
    diff_group: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(
            self.cnn_type, self.planes, self.time_dims, self.num_stblock,
            diff_group=self.diff_group, name="trunk"
        )(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out), x


class UAVSalSTBlocksType(nn.Module):
    """ST ordering ablation: st/s2t/t2s/s_s2t (reference: model.py:708-758)."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    planes: int = 256
    st_type: str = "st"
    diff_group: Optional[int] = None  # see UAVSalTeConv

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(
            self.cnn_type,
            self.planes,
            self.time_dims,
            self.num_stblock,
            st_type=self.st_type,
            diff_group=self.diff_group,
            name="trunk",
        )(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalSTC3D(nn.Module):
    """3D-conv temporal ablation (reference: model.py:760-800)."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(
            self.cnn_type,
            self.planes,
            self.time_dims,
            self.num_stblock,
            st_block_cls=STC3D,
            name="trunk",
        )(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalSTC23D(nn.Module):
    """2D+3D-conv ablation (reference: model.py:802-841)."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(
            self.cnn_type,
            self.planes,
            self.time_dims,
            self.num_stblock,
            st_block_cls=STC23D,
            name="trunk",
        )(x, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalMP(nn.Module):
    """MP-Net ablation: trunk + priors, no recurrence (reference: model.py:845-957).

    `diff_group` bounds the trunk's temporal differences per video when
    several videos are flattened into the batch (ZooModelAdapter sets it for
    V>1); None keeps the reference whole-batch behavior."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    bias_type: Sequence[int] = (1, 1, 1)
    planes: int = 256
    compat_cxt_tile: bool = True
    diff_group: Optional[int] = None

    @nn.compact
    def __call__(self, x, gauss_prior, ob_prior, train: bool = False):
        x = _Trunk(
            self.cnn_type, self.planes, self.time_dims, self.num_stblock,
            diff_group=self.diff_group, name="trunk"
        )(x, train)
        x = MultiPriors(
            self.planes, self.time_dims, self.bias_type, self.compat_cxt_tile, name="mp"
        )(x, gauss_prior, ob_prior, train)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


class UAVSalLSTM(nn.Module):
    """ConvLSTM-recurrence ablation (reference: model.py:960-1076).

    Same (V, S, ...) layout as UAVSal; state is (V, 2, Ho, Wo, planes)."""

    cnn_type: str = "mobilenet_v2"
    time_dims: int = 5
    num_stblock: int = 2
    bias_type: Sequence[int] = (1, 1, 1)
    planes: int = 256
    compat_cxt_tile: bool = True

    def init_state(self, height: int, width: int, n_videos: int = 1, dtype=jnp.float32):
        return jnp.zeros((n_videos, 2, height // 8, width // 8, self.planes), dtype)

    @nn.compact
    def __call__(self, x, gauss_prior, ob_prior, state, train: bool = False):
        v, s, h, w, c = x.shape
        x = x.reshape(v * s, h, w, c)
        x = _Trunk(
            self.cnn_type,
            self.planes,
            self.time_dims,
            self.num_stblock,
            diff_group=s if v > 1 else None,
            name="trunk",
        )(x, train)
        x = MultiPriors(
            self.planes, self.time_dims, self.bias_type,
            self.compat_cxt_tile and v == 1, name="mp",
        )(x, gauss_prior, ob_prior, train)
        ho, wo = x.shape[1], x.shape[2]
        x = x.reshape(v, s, ho, wo, self.planes)
        rnn = nn.vmap(
            ConvLSTM,
            in_axes=(0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(self.planes, 3, use_bias=False, name="rnn")
        x, new_state = rnn(x, state)
        x = x.reshape(v * s, ho, wo, self.planes)
        out = DWBlock(1, 3, name="conv_out_st", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out).reshape(v, s, ho, wo, 1), new_state


MODEL_ZOO = {
    "uavsal": UAVSal,
    "uavsal_spconv": UAVSalSpConv,
    "uavsal_teconv": UAVSalTeConv,
    "uavsal_stblocks": UAVSalSTBlocks,
    "uavsal_stblocks_type": UAVSalSTBlocksType,
    "uavsal_stc3d": UAVSalSTC3D,
    "uavsal_stc2_3d": UAVSalSTC23D,
    "uavsal_mp": UAVSalMP,
    "uavsal_lstm": UAVSalLSTM,
}


def build_model(name: str = "uavsal", **kwargs) -> nn.Module:
    return MODEL_ZOO[name.lower()](**kwargs)


def init_variables(model: nn.Module, rng, *args, **kwargs):
    """Initialize model variables under jit.

    Eager (unjitted) flax init dispatches every initializer and layer op
    separately, which is ~10x slower than one fused XLA program — always
    init through this helper. Compiled programs land in the persistent
    compilation cache, so repeat inits are near-free.
    """
    return jax.jit(model.init)(rng, *args, **kwargs)
