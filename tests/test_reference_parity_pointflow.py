"""PointFlow CNF dynamics goldens vs the reference's OWN ODE code.

``torchdiffeq`` is absent so the reference's full CNF cannot integrate, but
the dynamics themselves are importable pure torch
(python/difffacto/models/networks/flow_utils/odefunc.py:59-137: ``ODEnet``
over concat-squash layers + ``divergence_approx`` Hutchinson estimator).
This file compares, under shared weights:

* the ODE FIELD: reference ``ODEnet(cat[t, ctx], y)`` vs our
  ``ConcatSquashODE(y, t, ctx)`` (models/pointflow.py:24-45);
* the DIVERGENCE: reference ``divergence_approx`` (a VJP e^T(df/dy) then
  *e -> e^T J e) vs our JVP-based Hutchinson branch — same quadratic form —
  AND our exact-trace branch vs the estimator summed over the 3 basis
  vectors (e_i^T J e_i summed IS the trace, so the reference's own
  estimator corroborates our exact divergence);
* one hand-stepped RK4 step with divergence accounting vs our
  ``CNF(steps=1)`` (models/pointflow.py:48-112) — the reference solves the
  same ODE through torchdiffeq (flow_utils/cnf.py), ours with fixed-step
  RK4 in ``lax.scan``.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import REF_ROOT, _install_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

B, D, C = 4, 3, 8
DIMS = (32, 32)


def _build_pair(seed=7):
    """Reference ODEnet + our ConcatSquashODE with the SAME weights."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.networks.flow_utils.odefunc import ODEnet

    from difffacto_tpu.models.pointflow import ConcatSquashODE

    torch.manual_seed(seed)
    ref_net = ODEnet(
        hidden_dims=DIMS, input_shape=(D,), context_dim=C,
        layer_type="concatsquash", nonlinearity="tanh",
    )

    ours = ConcatSquashODE(dims=DIMS, out_dim=D)
    variables = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, D)), jnp.zeros(()), jnp.zeros((B, C)),
    )
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(variables["params"]))
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    n_layers = len(DIMS) + 1
    for i in range(n_layers):
        name = str(i) if i < len(DIMS) else "out"
        params[f"lin_{i}" if i < len(DIMS) else "lin_out"] = {
            "kernel": sd[f"layers.{i}._layer.weight"].T,
            "bias": sd[f"layers.{i}._layer.bias"],
        }
        params[f"gate_{i}" if i < len(DIMS) else "gate_out"] = {
            "kernel": sd[f"layers.{i}._hyper_gate.weight"].T,
            "bias": sd[f"layers.{i}._hyper_gate.bias"],
        }
        params[f"bias_{i}" if i < len(DIMS) else "bias_out"] = {
            "kernel": sd[f"layers.{i}._hyper_bias.weight"].T,
        }
        del name
    return ref_net, ours, {"params": params}


def _ref_field(ref_net, t, y_np, ctx_np, requires_grad=False):
    y = torch.from_numpy(y_np)
    if requires_grad:
        y.requires_grad_(True)
    tc = torch.cat(
        [torch.full((y_np.shape[0], 1), t), torch.from_numpy(ctx_np)], dim=1
    )
    return y, ref_net(tc, y)


def test_ode_field_parity():
    import jax.numpy as jnp

    ref_net, ours, V = _build_pair()
    rng = np.random.RandomState(0)
    y = rng.randn(B, D).astype(np.float32)
    ctx = rng.randn(B, C).astype(np.float32)
    for t in (0.0, 0.23, 0.5):
        with torch.no_grad():
            _, t_dy = _ref_field(ref_net, t, y, ctx)
        j_dy = ours.apply(V, jnp.asarray(y), jnp.asarray(t), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(j_dy), t_dy.numpy(), atol=1e-6)


def test_divergence_estimator_parity():
    """Reference divergence_approx (VJP form) vs our JVP Hutchinson branch:
    identical quadratic form e^T J e; and summed over the 3 basis vectors it
    equals our exact-trace branch."""
    import jax
    import jax.numpy as jnp

    from difffacto.models.networks.flow_utils.odefunc import divergence_approx

    ref_net, ours, V = _build_pair()
    rng = np.random.RandomState(1)
    y_np = rng.randn(B, D).astype(np.float32)
    ctx = rng.randn(B, C).astype(np.float32)
    eps_np = rng.randn(B, D).astype(np.float32)
    t = 0.37

    def t_div(e_np):
        y, dy = _ref_field(ref_net, t, y_np, ctx, requires_grad=True)
        return divergence_approx(dy, y, torch.from_numpy(e_np)).detach().numpy()

    # our Hutchinson branch (JVP form) against the reference VJP form
    f = lambda yy: ours.apply(V, yy, jnp.asarray(t), jnp.asarray(ctx))
    _, jvp = jax.jvp(f, (jnp.asarray(y_np),), (jnp.asarray(eps_np),))
    our_hutch = np.asarray((jvp * jnp.asarray(eps_np)).sum(-1))
    np.testing.assert_allclose(our_hutch, t_div(eps_np), atol=2e-5)

    # reference estimator summed over basis vectors == exact trace == our
    # exact-trace branch (models/pointflow.py:65-77)
    ref_trace = sum(
        t_div(np.eye(D, dtype=np.float32)[i][None].repeat(B, 0)) for i in range(D)
    )
    our_exact = np.zeros((B,), np.float32)
    for i in range(D):
        basis = jnp.zeros((B, D)).at[:, i].set(1.0)
        _, jv = jax.jvp(f, (jnp.asarray(y_np),), (basis,))
        our_exact = our_exact + np.asarray(jv[:, i])
    np.testing.assert_allclose(our_exact, ref_trace, atol=2e-5)


def test_rk4_step_with_divergence_accounting():
    """One RK4 step of (y, -div) hand-stepped through the reference ODEnet
    equals our CNF(steps=1) integrator output and delta_logp."""
    import jax
    import jax.numpy as jnp

    from difffacto.models.networks.flow_utils.odefunc import divergence_approx

    from difffacto_tpu.models.pointflow import CNF

    ref_net, ours, V = _build_pair()
    rng = np.random.RandomState(2)
    y0 = rng.randn(B, D).astype(np.float32)
    ctx = rng.randn(B, C).astype(np.float32)
    dt = 0.5

    def ref_f_div(t, y_np):
        """(field, exact divergence via basis-summed divergence_approx)."""
        divs = []
        with torch.no_grad():
            _, dy = _ref_field(ref_net, t, y_np, ctx)
        for i in range(D):
            e = np.eye(D, dtype=np.float32)[i][None].repeat(B, 0)
            y, dyg = _ref_field(ref_net, t, y_np, ctx, requires_grad=True)
            divs.append(divergence_approx(dyg, y, torch.from_numpy(e)).detach().numpy())
        return dy.numpy(), sum(divs)

    k1, d1 = ref_f_div(0.0, y0)
    k2, d2 = ref_f_div(dt / 2, y0 + dt / 2 * k1)
    k3, d3 = ref_f_div(dt / 2, y0 + dt / 2 * k2)
    k4, d4 = ref_f_div(dt, y0 + dt * k3)
    y1 = y0 + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    div_int = dt / 6 * (d1 + 2 * d2 + 2 * d3 + d4)

    cnf = CNF(dims=DIMS, out_dim=D, steps=1, T=dt, exact_trace=True)
    cnf_vars = cnf.init(
        jax.random.PRNGKey(0), jnp.asarray(y0), jnp.asarray(ctx)
    )
    cnf_V = {"params": {"ode": V["params"]}}
    # the init tree must structurally match the ingested one
    chex = jax.tree_util.tree_structure(jax.device_get(cnf_vars["params"]))
    assert chex == jax.tree_util.tree_structure(cnf_V["params"])
    j_y1, j_delta = cnf.apply(cnf_V, jnp.asarray(y0), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(j_y1), y1, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_delta), -div_int, atol=2e-5)
