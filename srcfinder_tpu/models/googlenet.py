"""GoogLeNet / Inception-v1 with 1 input channel, in Flax.

TPU re-implementation of the reference architecture
(reference: cnn/archs/googlenet1.py): conv1 takes 1 channel
(googlenet1.py:60), num_classes=2, aux classifiers kept for training
(googlenet1.py:80-85), BasicConv2d = conv(bias=False) + BN(eps=0.001) +
ReLU (googlenet1.py:266-275), inception branch3 uses kernel_size=3 (the
torchvision 5x5 "known bug" preserved for weight compatibility,
googlenet1.py:205-210), trunc-normal(std=0.01, a=-2, b=2) init
(googlenet1.py:94-100).

Layout is NHWC (TPU-native); the torch converter transposes OIHW->HWIO.
MaxPool uses ceil_mode semantics via explicit edge padding with -inf.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

__all__ = ["GoogLeNet", "googlenet", "CAMPAIGN_NORM", "clamp_ch4",
           "fuse_variables", "fuse_inference", "fold_variables",
           "fold_inference"]

#: per-campaign normalization constants
#: (reference: cnn/cnn_pred_pipeline.py:126-157)
CAMPAIGN_NORM = {
    "COVID_QC": (110.6390, 183.9152),
    "CalCH4_v8": (140.6399, 237.5434),
    "Permian_QC": (100.2635, 158.7060),
    "multi_256": (115.0, 190.0),
    "multi_64": (115.0, 190.0),
}


def clamp_ch4(x, vmin=0.0, vmax=4000.0):
    """ClampCH4 preprocessing (reference: cnn_pred_pipeline.py:19-30)."""
    return jnp.clip(x, vmin, vmax)


def _dilated_maxpool(x, window: int, d: int, symmetric: bool = False):
    """Stride-1 max pool with window dilation ``d`` — the a-trous form
    of the trunk's stride-2 ceil-mode pools (end-anchored, padded with
    -inf so out-of-range taps are ignored exactly like ceil_mode) and of
    the inception pool branch (``symmetric=True``, pad d both sides)."""
    pad = (window - 1) * d
    pads = (pad // 2, pad - pad // 2) if symmetric else (0, pad)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), pads, pads, (0, 0)], window_dilation=(1, d, d, 1))


def _ceil_maxpool(x, window: int, stride: int):
    """MaxPool2d(window, stride, ceil_mode=True) in NHWC.

    torch ceil_mode pads on the bottom/right so that the last window may
    start inside the input; pad with -inf and pool VALID.
    """
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


def adaptive_avg_pool2d(x, out_hw):
    """torch F.adaptive_avg_pool2d in NHWC: bin i spans
    [floor(i*H/out), ceil((i+1)*H/out)) — bins may overlap (e.g. 14->4)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, r0:r1, c0:c1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def trunc_normal_init(std=0.01, lower=-2.0, upper=2.0):
    """torch.nn.init.trunc_normal_(std=0.01, a=-2, b=2) equivalent
    (reference: googlenet1.py:97). Note a/b are absolute bounds."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(
            key, lower / std, upper / std, shape, dtype) * std
    return init


class BasicConv2d(nn.Module):
    """conv(bias=False) + BatchNorm(eps=1e-3) + ReLU
    (reference: googlenet1.py:266-275).

    ``folded=True`` (inference only): the BatchNorm affine + running
    stats are pre-folded into the conv kernel/bias
    (:func:`fold_variables`), so the module is conv(bias)+ReLU and the
    separate BN elementwise pass over the activation map — a pure
    HBM-bandwidth cost measured at ~18% of the exact-CNN device time on
    the v5e — disappears (XLA fuses bias+ReLU into the conv epilogue)."""
    features: int
    kernel_size: int = 1
    strides: int = 1
    padding: int = 0
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dilation: int = 1,
                 stride_one: bool = False):
        if self.folded and train:
            raise ValueError("folded BasicConv2d is inference-only")
        strides = 1 if stride_one else self.strides
        x = nn.Conv(self.features,
                    (self.kernel_size, self.kernel_size),
                    strides=(strides, strides),
                    padding=[(self.padding * dilation,) * 2] * 2,
                    kernel_dilation=(dilation, dilation),
                    use_bias=self.folded,
                    kernel_init=trunc_normal_init(),
                    dtype=self.dtype, name="conv")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class Inception(nn.Module):
    """Four-branch inception block (reference: googlenet1.py:184-228).

    ``fused=True`` (inference only) runs the three parallel 1x1 convs
    (branch1, branch2_0, branch3_0) as ONE wide conv+BN named ``fused0``
    and slices the result: per-output-channel math is unchanged (conv
    dot products and BatchNorm affine are channelwise), but the input
    map is read from HBM once instead of three times and the MXU sees
    one wide contraction instead of three narrow ones. Parameters for
    the fused layout come from :func:`fuse_variables` — checkpoints
    always store the canonical (unfused) tree.
    """
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    dtype: Any = jnp.float32
    fused: bool = False
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dilation: int = 1):
        conv = partial(BasicConv2d, dtype=self.dtype, folded=self.folded)
        if self.fused:
            if train:
                raise ValueError("fused inception is inference-only")
            f = conv(self.ch1x1 + self.ch3x3red + self.ch5x5red, 1,
                     name="fused0")(x, train)
            c1, c2 = self.ch1x1, self.ch1x1 + self.ch3x3red
            b1, b2, b3 = f[..., :c1], f[..., c1:c2], f[..., c2:]
        else:
            b1 = conv(self.ch1x1, 1, name="branch1")(x, train)
            b2 = conv(self.ch3x3red, 1, name="branch2_0")(x, train)
            b3 = conv(self.ch5x5red, 1, name="branch3_0")(x, train)
        b2 = conv(self.ch3x3, 3, padding=1, name="branch2_1")(b2, train,
                                                              dilation)
        # kernel 3 (not 5): torchvision weight-compat quirk
        b3 = conv(self.ch5x5, 3, padding=1, name="branch3_1")(b3, train,
                                                              dilation)
        if dilation == 1:
            b4 = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                     constant_values=-jnp.inf),
                             (3, 3), strides=(1, 1), padding="VALID")
        else:
            b4 = _dilated_maxpool(x, 3, dilation, symmetric=True)
        b4 = conv(self.pool_proj, 1, name="branch4_1")(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionAux(nn.Module):
    """Aux classifier head (reference: googlenet1.py:231-263)."""
    num_classes: int
    dropout: float = 0.7
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = adaptive_avg_pool2d(x, (4, 4))
        n = x.shape[0]
        x = BasicConv2d(128, 1, dtype=self.dtype, folded=self.folded,
                        name="conv")(x, train)
        x = x.reshape(n, -1)
        x = nn.relu(nn.Dense(1024, kernel_init=trunc_normal_init(),
                             dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc2")(x)
        return x


class GoogLeNet(nn.Module):
    """1-channel GoogLeNet (reference: googlenet1.py:27-163).

    __call__(x NHWC, train) -> logits, or (logits, aux2, aux1) when
    training with aux_logits (matching GoogLeNetOutputs ordering,
    googlenet1.py:19).
    """
    num_classes: int = 2
    aux_logits: bool = True
    dropout: float = 0.2
    dropout_aux: float = 0.7
    dtype: Any = jnp.float32
    fused: bool = False
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False,
                 stage: int | None = None, dilated: bool = False,
                 start_stage: int = 1, start_pooled: bool = False):
        """``start_stage`` (1..5) enters the forward mid-trunk: ``x`` is
        the OUTPUT of stage ``start_stage - 1`` and computation runs
        from there to the head — the resume seam for externally
        computed early stages (used by the r4 Pallas trunk bake-off,
        SCALING.md "Pallas verdict (r4)", and stagewise probing).
        ``start_pooled=True`` declares that ``x`` has ALSO been through
        stage ``start_stage``'s leading ceil-mode maxpool — that pool
        is skipped.

        ``stage`` (1..5) computes only that stride-2 trunk stage on
        already-computed features — the phase-deduplicated FCN path
        (detect.fcn_pipeline.fcn_phase_saliency) drives stages
        individually. Stage boundaries are the downsampling ops:
        1: conv1 | 2: maxpool1+conv2+conv3 | 3: maxpool2+inception3 |
        4: maxpool3+inception4 | 5: maxpool4+inception5.

        ``dilated=True`` runs the trunk a-trous: every stride-2 op
        becomes stride-1 and downstream kernels dilate by the cumulative
        removed stride, so the output is the FULL-RESOLUTION dense
        stride-32 feature field — algebraically identical to evaluating
        all 1024 shift-and-stitch phases (fcn_pred_pipeline.py:32-95) in
        one pass. Returns trunk features (N, H, W, 1024); apply fc per
        position for dense logits.
        """
        conv = partial(BasicConv2d, dtype=self.dtype, folded=self.folded)
        inc = partial(Inception, dtype=self.dtype, fused=self.fused,
                      folded=self.folded)

        if dilated:
            x = conv(64, 7, strides=2, padding=3, name="conv1")(
                x, train, stride_one=True)
            x = _dilated_maxpool(x, 3, 2)
            x = conv(64, 1, name="conv2")(x, train)
            x = conv(192, 3, padding=1, name="conv3")(x, train, 4)
            x = _dilated_maxpool(x, 3, 4)
            x = inc(64, 96, 128, 16, 32, 32, name="inception3a")(x, train, 8)
            x = inc(128, 128, 192, 32, 96, 64,
                    name="inception3b")(x, train, 8)
            x = _dilated_maxpool(x, 3, 8)
            x = inc(192, 96, 208, 16, 48, 64,
                    name="inception4a")(x, train, 16)
            x = inc(160, 112, 224, 24, 64, 64,
                    name="inception4b")(x, train, 16)
            x = inc(128, 128, 256, 24, 64, 64,
                    name="inception4c")(x, train, 16)
            x = inc(112, 144, 288, 32, 64, 64,
                    name="inception4d")(x, train, 16)
            x = inc(256, 160, 320, 32, 128, 128,
                    name="inception4e")(x, train, 16)
            x = _dilated_maxpool(x, 2, 16)
            x = inc(256, 160, 320, 32, 128, 128,
                    name="inception5a")(x, train, 32)
            x = inc(384, 192, 384, 48, 128, 128,
                    name="inception5b")(x, train, 32)
            return x

        if stage in (None, 1) and start_stage <= 1:
            x = conv(64, 7, strides=2, padding=3, name="conv1")(x, train)
            if stage == 1:
                return x
        if stage in (None, 2) and start_stage <= 2:
            x = _ceil_maxpool(x, 3, 2)
            x = conv(64, 1, name="conv2")(x, train)
            x = conv(192, 3, padding=1, name="conv3")(x, train)
            if stage == 2:
                return x
        if stage in (None, 3) and start_stage <= 3:
            if not (start_pooled and start_stage == 3):
                x = _ceil_maxpool(x, 3, 2)
            x = inc(64, 96, 128, 16, 32, 32, name="inception3a")(x, train)
            x = inc(128, 128, 192, 32, 96, 64, name="inception3b")(x, train)
            if stage == 3:
                return x

        aux1 = aux2 = None
        if stage in (None, 4) and start_stage <= 4:
            if not (start_pooled and start_stage == 4):
                x = _ceil_maxpool(x, 3, 2)
            x = inc(192, 96, 208, 16, 48, 64, name="inception4a")(x, train)
            if stage is None and self.aux_logits and train:
                aux1 = InceptionAux(self.num_classes, self.dropout_aux,
                                    dtype=self.dtype, name="aux1")(x, train)
            x = inc(160, 112, 224, 24, 64, 64, name="inception4b")(x, train)
            x = inc(128, 128, 256, 24, 64, 64, name="inception4c")(x, train)
            x = inc(112, 144, 288, 32, 64, 64, name="inception4d")(x, train)
            if stage is None and self.aux_logits and train:
                aux2 = InceptionAux(self.num_classes, self.dropout_aux,
                                    dtype=self.dtype, name="aux2")(x, train)
            x = inc(256, 160, 320, 32, 128, 128, name="inception4e")(x, train)
            if stage == 4:
                return x
        if stage in (None, 5) and start_stage <= 5:
            if not (start_pooled and start_stage == 5):
                x = _ceil_maxpool(x, 2, 2)
            x = inc(256, 160, 320, 32, 128, 128, name="inception5a")(x, train)
            x = inc(384, 192, 384, 48, 128, 128, name="inception5b")(x, train)
            if stage == 5:
                return x

        if features_only:
            # FCN trunk output (reference: fcn_pred_pipeline.py:157 keeps
            # children[:-5], i.e. everything up to inception5b)
            return x

        x = x.mean(axis=(1, 2))                  # AdaptiveAvgPool2d((1,1))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc")(x)
        if train and self.aux_logits:
            return x, aux2, aux1
        return x


def googlenet(num_classes: int = 2, aux_logits: bool = True, **kwargs):
    """Factory (reference: googlenet1.py:278-291)."""
    return GoogLeNet(num_classes=num_classes, aux_logits=aux_logits, **kwargs)


def _fuse_block(params):
    """Concatenate one inception block's three parallel 1x1 conv+BN
    param sets (branch1, branch2_0, branch3_0 — in the output-channel
    order Inception slices) into the ``fused0`` layout.

    Pure numpy on purpose (r4): these transforms run eagerly at
    CLI/process startup, and on this box every eager jnp op is a
    ~30 ms tunnel round trip plus, for each distinct tiny shape, a
    multi-second remote compile that the persistent cache refuses to
    keep (below its 1 s floor) — measured minutes per process across
    the ~60 folded blocks. Host numpy does the same reshuffle in
    milliseconds; the weights transfer to the device once, at the
    first jit call."""
    out = {k: v for k, v in params.items()
           if k not in ("branch1", "branch2_0", "branch3_0")}
    parts = [params["branch1"], params["branch2_0"], params["branch3_0"]]
    fused = {}
    for sub in parts[0]:                          # conv (params) / bn
        fused[sub] = {k: np.concatenate([np.asarray(p[sub][k])
                                         for p in parts], axis=-1)
                      for k in parts[0][sub]}
    out["fused0"] = fused
    return out


def fuse_variables(variables):
    """Canonical GoogLeNet variables -> the ``fused=True`` layout.

    Per-channel math (1x1 conv dot products, BatchNorm affine/stats) is
    invariant under output-channel concatenation, so the fused model's
    outputs match the canonical model's exactly up to accumulation-order
    rounding. Checkpoints and the torch converter always use the
    canonical tree; call this at inference-load time.
    """
    fused = {}
    for col, tree in variables.items():           # params / batch_stats
        fused[col] = {
            mod: (_fuse_block(sub) if isinstance(sub, dict)
                  and "branch2_0" in sub else sub)
            for mod, sub in tree.items()}
    return fused


def fuse_inference(model: GoogLeNet, variables):
    """(model, canonical variables) -> (fused model, fused variables):
    the inference-time trunk with each inception's three parallel 1x1
    convs as one wide conv (one HBM read of the input map, one wide MXU
    contraction). Use for prediction paths only — training and
    checkpoints stay canonical."""
    return model.clone(fused=True), fuse_variables(variables)


def _fold_conv_bn(conv, bn, stats, eps: float = 1e-3):
    """conv(bias=False) + BN(affine, running stats) -> conv(kernel', bias').

    kernel' = kernel * scale/sqrt(var+eps) (broadcast over the output-
    channel axis), bias' = bias_bn - mean*scale/sqrt(var+eps) — the
    standard inference-time BatchNorm fold, done in f32 (params are
    stored f32; the cast to the compute dtype happens at apply).
    Pure numpy — see :func:`_fuse_block` for why."""
    dt = np.asarray(conv["kernel"]).dtype
    inv = (np.asarray(bn["scale"], np.float32)
           / np.sqrt(np.asarray(stats["var"], np.float32) + eps))
    kernel = np.asarray(conv["kernel"], np.float32) * inv
    bias = (np.asarray(bn["bias"], np.float32)
            - np.asarray(stats["mean"], np.float32) * inv)
    return {"kernel": kernel.astype(dt), "bias": bias.astype(dt)}


def _fold_tree(params, stats):
    """Recursively fold every {conv, bn} BasicConv2d scope in ``params``
    using the matching running stats subtree."""
    if "conv" in params and "bn" in params and "kernel" in params["conv"]:
        out = {k: v for k, v in params.items() if k != "bn"}
        out["conv"] = _fold_conv_bn(params["conv"], params["bn"],
                                    stats["bn"])
        return out
    return {k: (_fold_tree(v, stats.get(k, {})) if isinstance(v, dict)
                else v)
            for k, v in params.items()}


def fold_variables(variables):
    """Canonical (or fused) variables -> the ``folded=True`` layout:
    BatchNorm folded into each conv's kernel/bias; the ``batch_stats``
    collection disappears. Algebraically exact; float rounding differs
    by O(eps) from the unfolded graph."""
    params = _fold_tree(variables["params"],
                        variables.get("batch_stats", {}))
    return {"params": params}


def fold_inference(model: GoogLeNet, variables):
    """(model, canonical variables) -> (folded+fused model, variables):
    the full inference-time transform — parallel 1x1 convs widened
    (:func:`fuse_variables`) AND BatchNorm folded into the conv weights
    (:func:`fold_variables`). On the v5e the separate BN/bias elementwise
    passes were ~18% of exact-CNN device time (pure HBM traffic);
    folding removes them across every inference path. Training and
    checkpoints stay canonical.

    The fold/fuse math runs in host numpy (see :func:`_fuse_block`),
    then the whole tree is committed to the default device HERE with
    ONE ``jax.device_put`` (a transfer, not an op — no eager-compile
    tax): host-resident weights would otherwise be re-uploaded on
    EVERY jitted call (~24 MB/call, measured ~0.3-0.9 s through the
    tunnel depending on its state). For a half-precision inference
    model the tree is cast on the host first — Flax casts params to
    ``model.dtype`` at compute time anyway (identical numerics), and
    uploading f32 doubles the tunnel bytes for no reason (the upload
    was the fcn stage's critical path under degraded tunnel bandwidth,
    SCALING.md "The e2e warm>cold mystery")."""
    folded = fold_variables(fuse_variables(variables))
    if model.dtype in (jnp.bfloat16, jnp.float16):
        folded = jax.tree.map(
            lambda a: a.astype(model.dtype)
            if getattr(a, "dtype", None) == np.float32 else a, folded)
    return model.clone(fused=True, folded=True), jax.device_put(folded)
