"""Float codec stack: GDN, entropy models, hyperprior, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_image_compression_network_tpu.codec import entropy
from simple_image_compression_network_tpu.ops.gdn import GDN, lower_bound
from simple_image_compression_network_tpu.models.hyperprior import (
    FactorizedPrior, ScaleHyperprior)
from simple_image_compression_network_tpu import train


def test_gdn_inverse_pair(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    gdn = GDN()
    params = gdn.init(jax.random.key(0), x)
    y = gdn.apply(params, x)
    assert y.shape == x.shape
    # at init (beta=1, gamma=0.1*I) GDN shrinks, IGDN expands
    igdn = GDN(inverse=True)
    pi = igdn.init(jax.random.key(0), x)
    z = igdn.apply(pi, y)
    # identical params => igdn(gdn(x)) ~ x when norms match structure-wise;
    # at least finite + correlated
    assert np.isfinite(np.asarray(z)).all()
    assert np.corrcoef(np.asarray(z).ravel(), np.asarray(x).ravel())[0, 1] > 0.9


def test_lower_bound_gradients():
    g = jax.grad(lambda x: lower_bound(x, 1.0))
    assert g(2.0) == 1.0          # above bound: pass
    assert g(0.5) == 0.0          # below bound, pushing down: blocked
    g_up = jax.grad(lambda x: -lower_bound(x, 1.0))
    assert g_up(0.5) == -1.0      # below bound, pushing up: pass


def test_ste_quantize_grad():
    x = jnp.array([0.4, 1.6, -2.3])
    np.testing.assert_array_equal(np.asarray(entropy.quantize_ste(x)),
                                  [0.0, 2.0, -2.0])
    g = jax.grad(lambda v: jnp.sum(entropy.quantize_ste(v) * 3.0))(x)
    np.testing.assert_array_equal(np.asarray(g), [3.0, 3.0, 3.0])


def test_gaussian_conditional_likelihood_normalizes():
    # sum over all integers ~ 1 for any scale
    v = jnp.arange(-50, 51, dtype=jnp.float32)
    for s in [0.2, 1.0, 7.0]:
        p = entropy.GaussianConditional.likelihood(v, jnp.full_like(v, s))
        assert abs(float(p.sum()) - 1.0) < 1e-3


def test_factorized_entropy_is_a_density(rng):
    fe = entropy.FactorizedEntropy(channels=4)
    y = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    params = fe.init(jax.random.key(0), y)
    v = jnp.arange(-200, 201, dtype=jnp.float32)
    grid = jnp.tile(v[:, None], (1, 4))
    p = fe.apply(params, grid, method=fe.likelihood)
    total = np.asarray(p).sum(0)
    assert ((total > 0.97) & (total < 1.03)).all()


def test_quantized_cdf_tables():
    cdf = entropy.gaussian_cdf_table(1.0, max_abs=16)
    assert cdf[0] == 0 and cdf[-1] == 1 << entropy.CDF_PRECISION
    freqs = np.diff(cdf)
    assert (freqs >= 1).all()
    # symmetric-ish around the center symbol
    c = 16
    assert abs(int(freqs[c - 1]) - int(freqs[c + 1])) <= 1


def test_scale_table_roundtrip():
    table = entropy.default_scale_table()
    idx = entropy.scale_to_index(np.array([0.05, 0.5, 10.0, 1e4]), table)
    assert (idx >= 0).all() and (idx <= len(table) - 1).all()
    # chosen bin upper-bounds the scale (conservative coding)
    assert table[idx[1]] >= 0.5


@pytest.mark.parametrize("cls", [FactorizedPrior, ScaleHyperprior])
def test_model_forward_shapes(cls, rng):
    model = cls(n=32, m=48)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x, key=jax.random.key(1))
    out = model.apply(params, x, key=jax.random.key(2))
    assert out["x_hat"].shape == x.shape
    assert out["y_hat"].shape == (1, 4, 4, 48)
    assert float(out["bpp"]) > 0


def test_train_step_improves_loss(rng):
    cfg = train.TrainConfig(model="hyperprior", n=16, m=24, crop=64, batch=2,
                            lr=1e-3)
    key = jax.random.key(0)
    model, params, opt_state = train.init_state(cfg, key)
    step = jax.jit(train.make_train_step(cfg))
    batch = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    losses = []
    for i in range(8):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
