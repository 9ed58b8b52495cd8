"""Numerical parity of torch-checkpoint ingestion.

Builds torch modules with the reference's exact layer conventions
(reference: pointnet.py:124-213, attention.py:50-306, flow.py:7-79), runs
them in eval mode, converts their state dicts through
difffacto_tpu.utils.torch_ingest, and checks our flax modules reproduce the
outputs on the same inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from difffacto_tpu.utils.torch_ingest import (
    TreeFiller,
    _map_block,
    _map_flows,
    _map_head_mlp,
    _map_pointnet_stack,
    convert_state_dict,
)

K = 4
ZDIM = 8


# ---------------------------------------------------------- torch replicas
class TorchPointNetV2(tnn.Module):
    """pointnet.py:124-213 with per_part_mlp=True."""

    def __init__(self, zdim=ZDIM, num_anchors=K):
        super().__init__()
        self.zdim, self.num_anchors = zdim, num_anchors
        self.conv1 = tnn.Conv1d(3, 128, 1)
        self.conv2 = tnn.Conv1d(128, 128, 1)
        self.conv3 = tnn.Conv1d(128, 256, 1)
        self.conv4 = tnn.Conv1d(256, 512, 1)
        self.bn1 = tnn.BatchNorm1d(128)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(256)
        self.bn4 = tnn.BatchNorm1d(512)
        g = num_anchors

        def head():
            return tnn.Sequential(
                tnn.Conv1d(512 * g, 256 * g, 1, groups=g),
                tnn.BatchNorm1d(256 * g),
                tnn.ReLU(),
                tnn.Conv1d(256 * g, 128 * g, 1, groups=g),
                tnn.BatchNorm1d(128 * g),
                tnn.ReLU(),
                tnn.Conv1d(128 * g, zdim * g, 1, groups=g),
            )

        self.mlp_m = head()
        self.mlp_v = head()

    def forward(self, x, attn_weight):
        B = x.shape[0]
        x = x.transpose(1, 2)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.bn4(self.conv4(x))
        weighted = x.unsqueeze(-1) * attn_weight.unsqueeze(1) * self.num_anchors
        x = torch.max(weighted, 2)[0].view(B, 512, self.num_anchors)
        x = x.transpose(1, 2).reshape(B, -1, 1)
        m = self.mlp_m(x).reshape(B, self.num_anchors, -1)
        v = self.mlp_v(x).reshape(B, self.num_anchors, -1)
        return m, v


class TorchGEGLU(tnn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = tnn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class TorchFF(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.Sequential(TorchGEGLU(dim, dim * mult), tnn.Identity(), tnn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.net(x)


class TorchCrossAttention(tnn.Module):
    """attention.py:161-204."""

    def __init__(self, query_dim, context_dim=None, heads=2, dim_head=8):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.scale = dim_head**-0.5
        self.heads = heads
        self.dim_head = dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, query_dim), tnn.Identity())

    def forward(self, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        ctx = x if context is None else context
        B, N, _ = x.shape
        M = ctx.shape[1]
        q = self.to_q(x).reshape(B, N, h, d)
        k = self.to_k(ctx).reshape(B, M, h, d)
        v = self.to_v(ctx).reshape(B, M, h, d)
        sim = torch.einsum("bnhd,bmhd->bhnm", q, k) * self.scale
        if mask is not None:
            sim = sim.masked_fill(~mask[:, None, None, :].bool(), -torch.finfo(sim.dtype).max)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * d)
        return self.to_out(out)


class TorchBlock(tnn.Module):
    """BasicTransformerBlock single_attn (attention.py:259-306)."""

    def __init__(self, dim, heads, dim_head, context_dim=None):
        super().__init__()
        self.attn2 = TorchCrossAttention(dim, context_dim, heads, dim_head)
        self.ff = TorchFF(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, context=None, mask=None):
        x = self.attn2(self.norm2(x), context, mask) + x
        return self.ff(self.norm3(x)) + x


class TorchCoupling(tnn.Module):
    """flow.py:7-47."""

    def __init__(self, d, hidden, swap):
        super().__init__()
        self.d = d - d // 2
        self.swap = swap
        self.net_s_t = tnn.Sequential(
            tnn.Linear(self.d, hidden), tnn.ReLU(), tnn.Linear(hidden, hidden),
            tnn.ReLU(), tnn.Linear(hidden, (d - self.d) * 2),
        )

    def forward(self, x, reverse=False):
        if self.swap:
            x = torch.cat([x[:, self.d:], x[:, : self.d]], 1)
        out_dim = x.shape[1] - self.d
        s_t = self.net_s_t(x[:, : self.d])
        scale = torch.sigmoid(s_t[:, :out_dim] + 2.0)
        shift = s_t[:, out_dim:]
        y1 = (x[:, self.d:] - shift) / scale if reverse else x[:, self.d:] * scale + shift
        return (
            torch.cat([x[:, : self.d], y1], 1)
            if not self.swap
            else torch.cat([y1, x[:, : self.d]], 1)
        )


# ------------------------------------------------------------------- tests
def to_np_sd(module, prefix=""):
    return {f"{prefix}{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def test_pointnet_v2_parity():
    from difffacto_tpu.models import PointNetV2

    torch.manual_seed(0)
    tm = TorchPointNetV2().eval()
    # non-trivial running stats
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)

    jm = PointNetV2(point_dim=3, zdim=ZDIM, num_anchors=K, per_part_mlp=True)
    pts = np.random.RandomState(0).randn(2, 64, 3).astype(np.float32)
    seg = np.random.RandomState(1).randint(0, K, (2, 64))
    onehot = np.eye(K, dtype=np.float32)[seg]

    variables = jm.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(pts), jnp.asarray(onehot)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    fill = TreeFiller(params, stats)
    sd = to_np_sd(tm)
    _map_pointnet_stack(sd, fill, "", "pnet")
    # _map_pointnet_stack expects 'conv1' style keys without leading dot
    # (handled by the prefix-free replica), heads:
    _map_head_mlp(sd, fill, "mlp_m", "mlp_m", True, K)
    _map_head_mlp(sd, fill, "mlp_v", "mlp_v", True, K)
    assert not sd, sd.keys()

    with torch.no_grad():
        tm_m, tm_v = tm(torch.from_numpy(pts), torch.from_numpy(onehot))
    jm_m, jm_v = jm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(pts), jnp.asarray(onehot)
    )
    np.testing.assert_allclose(np.asarray(jm_m), tm_m.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jm_v), tm_v.numpy(), atol=2e-4)


def test_transformer_block_parity():
    from difffacto_tpu.nn.attention import BasicTransformerBlock

    torch.manual_seed(1)
    dim, heads, dh, cdim = 16, 2, 8, 12
    tb = TorchBlock(dim, heads, dh, cdim).eval()
    jb = BasicTransformerBlock(
        dim=dim, n_heads=heads, d_head=dh, context_dim=cdim, single_attn=True
    )
    rng = np.random.RandomState(2)
    x = rng.randn(2, 10, dim).astype(np.float32)
    ctx = rng.randn(2, 4, cdim).astype(np.float32)
    mask = np.array([[1, 1, 0, 1], [1, 1, 1, 1]], np.float32)

    variables = jb.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(mask)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    fill = TreeFiller(params, {})
    sd = to_np_sd(tb, "blk.")
    _map_block(sd, fill, "blk", "", single_attn=True)
    # strip the leading '/' the empty jprefix produces is handled by TreeFiller paths
    assert not sd, sd.keys()

    with torch.no_grad():
        t_out = tb(torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(mask))
    j_out = jb.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)


def test_flow_parity():
    from difffacto_tpu.models.flow import PerPartFlow

    torch.manual_seed(3)
    depth, hidden, dim = 4, 16, ZDIM
    tflows = [
        tnn.Sequential()
        for _ in range(K)
    ]

    class TorchChainFlow(tnn.Module):
        def __init__(self):
            super().__init__()
            self.chain = tnn.ModuleList(
                [TorchCoupling(dim, hidden, swap=(i % 2 == 0)) for i in range(depth)]
            )

        def forward(self, x, reverse=False):
            inds = range(depth - 1, -1, -1) if reverse else range(depth)
            for i in inds:
                x = self.chain[i](x, reverse=reverse)
            return x

    tflows = tnn.ModuleList([TorchChainFlow() for _ in range(K)]).eval()

    jf = PerPartFlow(n_class=K, depth=depth, dim=dim, intermediate_dim=hidden)
    x = np.random.RandomState(4).randn(2, K, dim).astype(np.float32)
    variables = jf.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    fill = TreeFiller(params, {})
    sd = to_np_sd(tflows, "flow.")
    _map_flows(sd, fill, "flow", "", K, depth)
    assert not sd, sd.keys()

    with torch.no_grad():
        t_out = torch.stack([tflows[i](torch.from_numpy(x[:, i])) for i in range(K)], 1)
    j_out = jf.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-4)
    # reverse path too
    with torch.no_grad():
        t_rev = torch.stack(
            [tflows[i](torch.from_numpy(x[:, i]), reverse=True) for i in range(K)], 1
        )
    j_rev = jf.apply({"params": params}, jnp.asarray(x), reverse=True)
    np.testing.assert_allclose(np.asarray(j_rev), t_rev.numpy(), atol=1e-4)
