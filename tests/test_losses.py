"""Loss tests: parity vs the torch reference + distributed SigLIP ring on a
virtual 8-device mesh vs a single-device full-matrix oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bcosification_tpu import losses as L

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@needs_reference
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("sparse", [True, False])
def test_bce_vs_torch(rng, smoothing, sparse):
    import torch

    ref = load_reference("bcos.modules.losses")
    x = rng.standard_normal((8, 10)).astype(np.float32)
    if sparse:
        t = rng.integers(0, 10, size=(8,))
        tt = torch.from_numpy(t)
        tj = jnp.asarray(t)
    else:
        t = rng.random((8, 10)).astype(np.float32)
        tt = torch.from_numpy(t)
        tj = jnp.asarray(t)
    ref_loss = ref.BinaryCrossEntropyLoss(smoothing=smoothing)(torch.from_numpy(x), tt)
    my_loss = L.BinaryCrossEntropyLoss(smoothing=smoothing)(jnp.asarray(x), tj)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("sparse", [True, False])
def test_cross_entropy_loss_vs_torch(rng, smoothing, sparse):
    """CrossEntropyLoss (the reference's plain-ViT baseline criterion,
    vit_final/experiment_parameters.py:119-120) vs torch.nn.CrossEntropyLoss,
    integer labels and class-probability targets, with label smoothing."""
    import torch

    x = rng.standard_normal((8, 10)).astype(np.float32)
    if sparse:
        t = rng.integers(0, 10, size=(8,))
        tt = torch.from_numpy(t)
        tj = jnp.asarray(t)
    else:
        t = rng.random((8, 10)).astype(np.float32)
        t /= t.sum(axis=1, keepdims=True)
        tt = torch.from_numpy(t)
        tj = jnp.asarray(t)
    ref_loss = torch.nn.CrossEntropyLoss(label_smoothing=smoothing)(
        torch.from_numpy(x), tt
    )
    my_loss = L.CrossEntropyLoss(label_smoothing=smoothing)(jnp.asarray(x), tj)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-5)


@needs_reference
def test_uniform_off_bce_vs_torch(rng):
    import torch

    ref = load_reference("bcos.modules.losses")
    x = rng.standard_normal((8, 10)).astype(np.float32)
    t = rng.integers(0, 10, size=(8,))
    ref_loss = ref.UniformOffLabelsBCEWithLogitsLoss()(
        torch.from_numpy(x), torch.from_numpy(t)
    )
    my_loss = L.UniformOffLabelsBCEWithLogitsLoss()(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-5)


@needs_reference
@pytest.mark.parametrize("negative_mode,with_negatives", [("unpaired", True), ("paired", True), ("unpaired", False)])
def test_info_nce_vs_torch(rng, negative_mode, with_negatives):
    import torch

    ref = load_reference("bcos.modules.losses")
    q = rng.standard_normal((6, 16)).astype(np.float32)
    p = rng.standard_normal((6, 16)).astype(np.float32)
    n = None
    nt = None
    if with_negatives:
        shape = (6, 4, 16) if negative_mode == "paired" else (9, 16)
        n = rng.standard_normal(shape).astype(np.float32)
        nt = torch.from_numpy(n)
    ref_loss = ref.info_nce(
        torch.from_numpy(q), torch.from_numpy(p), nt, negative_mode=negative_mode
    )
    my_loss = L.info_nce(
        jnp.asarray(q), jnp.asarray(p), None if n is None else jnp.asarray(n),
        negative_mode=negative_mode,
    )
    # XLA CPU matmul default precision differs slightly from torch fp32
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-3)


@needs_reference
@pytest.mark.parametrize("cos_scaling", [0, 3])
def test_siglip_local_vs_torch(rng, cos_scaling):
    import torch

    ref = load_reference("bcos.modules.losses")
    tmod = ref.SigLipLoss()
    if cos_scaling > 0:
        img = rng.standard_normal((49, 8, 16)).astype(np.float32)
    else:
        img = rng.standard_normal((8, 16)).astype(np.float32)
    txt = rng.standard_normal((8, 16)).astype(np.float32)
    scale, bias = np.exp(np.log(10.0)).astype(np.float32), np.float32(-10.0)
    ref_loss = tmod(
        torch.from_numpy(img), torch.from_numpy(txt),
        torch.tensor(scale), torch.tensor(bias), cos_scaling=cos_scaling,
    )
    my_loss = L.SigLipLoss()(
        jnp.asarray(img), jnp.asarray(txt), scale, bias, cos_scaling=cos_scaling
    )
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4)


def _global_siglip_oracle(img, txt, scale, bias, local_b):
    """Full-matrix oracle: per-rank SigLIP summed over the ring equals the loss
    on the full B x B block matrix with +1 on the global diagonal."""
    logits = scale * img @ txt.T + bias
    b = img.shape[0]
    labels = -np.ones((b, b), np.float32) + 2 * np.eye(b, dtype=np.float32)
    # -log sigmoid(z) = log(1 + exp(-z)), computed stably (the naive form
    # overflows to inf for |logits| > ~700 and falsely fails the test)
    return float(np.sum(np.logaddexp(0.0, -labels * logits)) / local_b)


@pytest.mark.parametrize("bidir", [True, False])
@pytest.mark.parametrize("n_dev", [4, 8])
def test_siglip_ring_multidevice(rng, bidir, n_dev):
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",))
    local_b, d = 4, 16
    img = rng.standard_normal((local_b * n_dev, d)).astype(np.float32)
    txt = rng.standard_normal((local_b * n_dev, d)).astype(np.float32)
    scale, bias = np.float32(10.0), np.float32(-10.0)

    loss_fn = L.SigLipLoss(bidir=bidir, axis_name="data")

    @jax.jit
    def total_loss(img, txt):
        def shard_loss(i, t):
            return jax.lax.psum(loss_fn(i, t, scale, bias), "data")

        return shard_map(
            shard_loss, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )(img, txt)

    got = float(total_loss(jnp.asarray(img), jnp.asarray(txt)))
    want = _global_siglip_oracle(img, txt, scale, bias, local_b)
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # gradients must flow through the ring (ppermute VJP = reverse ring)
    g = jax.grad(lambda i, t: total_loss(i, t))(jnp.asarray(img), jnp.asarray(txt))

    def oracle_np(i, t):
        logits = scale * i @ t.T + bias
        b = i.shape[0]
        labels = -jnp.ones((b, b)) + 2 * jnp.eye(b)
        return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / local_b

    g_want = jax.grad(oracle_np)(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), rtol=1e-4, atol=1e-6)


def test_clip_loss_multidevice_matches_single(rng):
    n_dev, local_b, d = 4, 4, 16
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    img = L._l2_normalize(jnp.asarray(rng.standard_normal((local_b * n_dev, d)).astype(np.float32)))
    txt = L._l2_normalize(jnp.asarray(rng.standard_normal((local_b * n_dev, d)).astype(np.float32)))

    single = L.ClipLoss()(img, txt, 100.0)

    dist_loss = L.ClipLoss(axis_name="data", local_loss=False)

    @jax.jit
    def dist(img, txt):
        def f(i, t):
            return jax.lax.pmean(dist_loss(i, t, 100.0), "data")

        return shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())(
            img, txt
        )

    np.testing.assert_allclose(float(dist(img, txt)), float(single), rtol=2e-3)

    # local_loss=True variant must agree too
    dist_loss_local = L.ClipLoss(axis_name="data", local_loss=True)

    @jax.jit
    def dist_local(img, txt):
        def f(i, t):
            return jax.lax.pmean(dist_loss_local(i, t, 100.0), "data")

        return shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())(
            img, txt
        )

    np.testing.assert_allclose(float(dist_local(img, txt)), float(single), rtol=2e-3)
