"""CNN -> FCN conversion.

Reference (cnn/fcn_pred_pipeline.py:155-160): strip the classifier
(avgpool/dropout/fc and aux heads) and carry the fc weights into a 1x1
conv so the network becomes fully convolutional with output stride 32.

In JAX a 1x1 conv over NHWC features is a per-pixel dense layer, so the
FCN head is just an einsum with the existing fc parameters — no surgery,
no weight copy.
"""

from __future__ import annotations

import jax.numpy as jnp

from .googlenet import GoogLeNet

__all__ = ["fcn_apply", "fcn_saliency"]


def fcn_apply(model: GoogLeNet, variables, x, train: bool = False):
    """Fully-convolutional logits at output stride 32.

    x: (N, H, W, 1) NHWC -> (N, H//32, W//32, num_classes)
    """
    feats = model.apply(variables, x, train=train, features_only=True)
    fc = variables["params"]["fc"]
    return jnp.einsum("nhwc,ck->nhwk", feats, fc["kernel"]) + fc["bias"]


def fcn_saliency(model: GoogLeNet, variables, x, train: bool = False):
    """Softmax class-1 probability map (reference:
    fcn_pred_pipeline.py:228-233)."""
    logits = fcn_apply(model, variables, x, train=train)
    import jax
    return jax.nn.softmax(logits, axis=-1)[..., 1]
