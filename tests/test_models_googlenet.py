"""GoogLeNet parity vs PyTorch.

The reference architecture module (cnn/archs/googlenet1.py) is imported
from the read-only reference tree purely as a *test oracle* — random
weights flow torch -> flax through the converter and forward passes must
agree. This validates the architecture, the layout transposes, the
ceil_mode pooling, the adaptive pooling bins, and the fc flatten order.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/cnn/archs")
try:
    import googlenet1 as ref_arch
    HAVE_REF = True
except Exception:
    HAVE_REF = False

from srcfinder_tpu.models import (googlenet, torch_state_dict_to_flax,
                                  fcn_apply, flax_to_torch_state_dict)

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference arch unavailable")


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = ref_arch.googlenet(num_classes=2, init_weights=True, aux_logits=True,
                           dropout=0.0, dropout_aux=0.0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    variables = torch_state_dict_to_flax(torch_model.state_dict())
    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    return model, variables


def _np(x):
    return x.detach().cpu().numpy()


def test_eval_forward_parity(torch_model, flax_setup):
    model, variables = flax_setup
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _np(torch_model(torch.as_tensor(x)))
    got = np.asarray(model.apply(variables, x.transpose(0, 2, 3, 1),
                                 train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_train_forward_parity_with_aux(torch_model, flax_setup):
    """Training-mode forward (batch-stats BN, dropout p=0) incl. aux heads.
    aux adaptive pooling uses torch's overlapping 14->4 bins."""
    import jax
    model, variables = flax_setup
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 224, 224)).astype(np.float32)
    torch_model.train()
    with torch.no_grad():
        out = torch_model(torch.as_tensor(x))
    torch_model.eval()
    (logits, aux2, aux1), _ = model.apply(
        variables, x.transpose(0, 2, 3, 1), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(logits), _np(out.logits),
                               rtol=1e-3, atol=1e-4)
    # torchvision forward() unpacks _forward's (x, aux2, aux1) as
    # (x, aux1, aux2) (googlenet1.py:174), so the reference's
    # .aux_logits2 field actually holds the aux1-head output and vice
    # versa; compare against the heads, not the misnamed fields.
    np.testing.assert_allclose(np.asarray(aux2), _np(out.aux_logits1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux1), _np(out.aux_logits2),
                               rtol=1e-3, atol=1e-4)


def test_fcn_parity(torch_model, flax_setup):
    """FCN conversion parity (reference: fcn_pred_pipeline.py:155-160)."""
    model, variables = flax_setup
    tm = torch_model
    fcn = torch.nn.Sequential(*list(tm.children())[:-5])
    fcn.add_module("final_conv", torch.nn.Conv2d(1024, 2, kernel_size=1))
    fcn.final_conv.weight.data.copy_(tm.fc.weight.data[:, :, None, None])
    fcn.final_conv.bias.data.copy_(tm.fc.bias.data)
    fcn.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 1, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = _np(fcn(torch.as_tensor(x)))          # (1, 2, 3, 3)
    got = np.asarray(fcn_apply(model, variables, x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_converter_roundtrip(torch_model):
    variables = torch_state_dict_to_flax(torch_model.state_dict())
    back = flax_to_torch_state_dict(variables)
    sd = {k: _np(v) for k, v in torch_model.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


import jax  # noqa: E402  (used in fixtures lazily)
