"""Event-by-event parity of the JAX EBP interpreter vs a torch-hook oracle.

Validates, on toy versions of every architecture pattern in the reference
model zoo (plain chains, residual forks with ConcatChannels/Multiply,
LightCNN max-feature-map), that the interpreter reproduces:

  * the forward values,
  * the backward hook-fire event order and layer tags,
  * the per-event MWP arrays for all four subtree modes,
  * natural (unmodified) backward gradients used by weighted-subtree gating,
  * static prior injection at arbitrary events.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracles.torch_ebp import HookEBP
from tests.oracles import nets as N
from xfr_tpu.ebp import interpreter as I

MODES = ["all", "norelu", "affineonly", "affineonly_with_prior"]


def _setup(netname, seed=0):
    make, shape = N.ALL_NETS[netname]
    tnet, graph, params, containers = make(seed)
    x = torch.randn(shape, generator=torch.Generator().manual_seed(7),
                    dtype=torch.float64)
    return tnet, graph, params, containers, x


@pytest.mark.parametrize("netname", list(N.ALL_NETS))
def test_forward_parity(netname):
    tnet, graph, params, _, x = _setup(netname)
    with torch.no_grad():
        y_ref = tnet(x).numpy()
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    y = np.asarray(values[graph.output_id])
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("netname", list(N.ALL_NETS))
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("with_bias", [False, True])
def test_ebp_event_parity(netname, mode, with_bias):
    tnet, graph, params, containers, x = _setup(netname)
    oracle = HookEBP(tnet, containers, eps=1e-12, with_bias=with_bias,
                     subtree_mode=mode)
    Pn = torch.zeros((1, 5), dtype=torch.float64)
    Pn[0, 2] = 1.0
    P_ref, names = oracle.run(x, Pn)

    out = I.ebp(graph, params, jnp.asarray(x.numpy()),
                jnp.asarray(Pn.numpy()), subtree_mode=mode, eps=1e-12,
                with_bias=with_bias)

    assert len(P_ref) == graph.n_events == len(out), (
        len(P_ref), graph.n_events)
    # Layer-tag order parity (P_layername analogue).
    tags = graph.event_names()
    for k, nm in enumerate(names):
        assert nm in tags[k] or tags[k] in nm or \
            (nm == "ReLU" and tags[k] == "ReLU"), (k, nm, tags[k])

    for k in range(graph.n_events):
        ref = P_ref[k].numpy()
        got = np.asarray(out[k])
        assert ref.shape == got.shape, (k, names[k], ref.shape, got.shape)
        np.testing.assert_allclose(
            got, ref, rtol=1e-7, atol=1e-10,
            err_msg=f"event {k} ({names[k]})")


@pytest.mark.parametrize("netname", list(N.ALL_NETS))
def test_natural_grad_parity(netname):
    tnet, graph, params, containers, x = _setup(netname)
    oracle = HookEBP(tnet, containers)
    cot = torch.zeros((1, 5), dtype=torch.float64)
    cot[0, 1] = 1.0
    dA_ref = oracle.run_grads(x, cot)

    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    out = I.natural_backward(graph, params, values, jnp.asarray(cot.numpy()))
    assert len(dA_ref) == graph.n_events
    for k in range(graph.n_events):
        np.testing.assert_allclose(
            np.asarray(out[k]), dA_ref[k].numpy(), rtol=1e-8, atol=1e-12,
            err_msg=f"event {k}")


@pytest.mark.parametrize("netname", list(N.ALL_NETS))
@pytest.mark.parametrize("mode", ["all", "norelu", "affineonly_with_prior"])
def test_prior_injection_parity(netname, mode):
    """Layerwise-EBP style: zero output cotangent + prior at one event."""
    tnet, graph, params, containers, x = _setup(netname)
    oracle = HookEBP(tnet, containers, eps=1e-12, subtree_mode=mode)
    Pn = torch.zeros((1, 5), dtype=torch.float64)
    Pn[0, 2] = 1.0
    P_base, _ = oracle.run(x, Pn)

    k_layer = graph.n_events // 2
    # elementwise prior: a single surviving element of the base MWP
    base = P_base[k_layer].numpy()
    elem = int(np.argmax(base))
    prior_np = np.zeros(base.size)
    prior_np[elem] = base.flat[elem]
    prior_np = prior_np.reshape(base.shape)

    priors = [None] * graph.n_events
    priors[k_layer] = torch.from_numpy(prior_np)
    P_ref, _ = oracle.run(x, torch.zeros_like(Pn), priors=priors)

    out = I.ebp(graph, params, jnp.asarray(x.numpy()),
                jnp.zeros((1, 5), jnp.float64), subtree_mode=mode, eps=1e-12,
                priors={k_layer: jnp.asarray(prior_np)})
    for k in range(graph.n_events):
        np.testing.assert_allclose(
            np.asarray(out[k]), P_ref[k].numpy(), rtol=1e-7, atol=1e-12,
            err_msg=f"event {k}")

    # Dynamic (traced) injection path must agree with the static one.
    out_dyn = I.ebp(graph, params, jnp.asarray(x.numpy()),
                    jnp.zeros((1, 5), jnp.float64), subtree_mode=mode,
                    eps=1e-12,
                    inject_spec=(jnp.int32(k_layer), jnp.int32(elem),
                                 jnp.float64(base.flat[elem])))
    for k in range(graph.n_events):
        np.testing.assert_allclose(
            np.asarray(out_dyn[k]), P_ref[k].numpy(), rtol=1e-7, atol=1e-12,
            err_msg=f"dyn event {k}")
