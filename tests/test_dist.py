"""Distribution math vs torch.distributions oracles."""
import numpy as np

import jax
import jax.numpy as jnp

import torch

from mlvae_tpu.nn import dist as D


def test_kld_std_normal_matches_closed_form():
    rs = np.random.RandomState(0)
    mean = rs.randn(5, 7).astype(np.float32)
    log_var = rs.randn(5, 7).astype(np.float32)
    ours = np.asarray(D.kld_std_normal(jnp.asarray(mean), jnp.asarray(log_var)))
    theirs = -0.5 * (1 + log_var - mean**2 - np.exp(log_var))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_kld_beta_matches_torch():
    rs = np.random.RandomState(1)
    alpha = (rs.rand(20).astype(np.float32) * 3 + 0.1)
    beta = (rs.rand(20).astype(np.float32) * 3 + 0.1)
    ours = np.asarray(D.kld_beta(jnp.asarray(alpha), jnp.asarray(beta), 1.0, 9.0))
    td = torch.distributions.kl_divergence(
        torch.distributions.Beta(torch.from_numpy(alpha), torch.from_numpy(beta)),
        torch.distributions.Beta(torch.tensor(1.0), torch.tensor(9.0)),
    ).numpy()
    # f32 digamma/gammaln differ slightly between XLA and torch kernels
    np.testing.assert_allclose(ours, td, rtol=3e-3, atol=1e-3)


def test_gaussian_nll_matches_reference_formula():
    rs = np.random.RandomState(2)
    mean = rs.randn(4, 6).astype(np.float32)
    log_var = rs.randn(4, 6).astype(np.float32)
    target = rs.randn(4, 6).astype(np.float32)
    ours = np.asarray(
        D.gaussian_nll(jnp.asarray(mean), jnp.asarray(log_var), jnp.asarray(target))
    )
    eps = 1e-5
    ll = -0.5 * (np.log(2 * np.pi) + log_var + (target - mean) ** 2 / (np.exp(log_var) + eps))
    np.testing.assert_allclose(ours, -ll, rtol=1e-5, atol=1e-6)


def test_bce_with_logits_matches_torch():
    rs = np.random.RandomState(3)
    logits = (rs.randn(50).astype(np.float32) * 5)
    targets = rs.randint(0, 2, 50).astype(np.float32)
    ours = np.asarray(D.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bce_matches_torch():
    rs = np.random.RandomState(4)
    probs = rs.rand(50).astype(np.float32) * 0.98 + 0.01
    targets = rs.randint(0, 2, 50).astype(np.float32)
    ours = np.asarray(D.bce(jnp.asarray(probs), jnp.asarray(targets)))
    theirs = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(probs), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_categorical_log_prob_matches_torch():
    rs = np.random.RandomState(5)
    logits = rs.randn(4, 9, 2).astype(np.float32)
    values = rs.randint(0, 2, (4, 9))
    ours = np.asarray(
        D.categorical_log_prob(jnp.asarray(logits), jnp.asarray(values))
    )
    td = torch.distributions.Categorical(logits=torch.from_numpy(logits))
    theirs = td.log_prob(torch.from_numpy(values)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_categorical_entropy_matches_torch():
    rs = np.random.RandomState(6)
    logits = rs.randn(4, 9, 2).astype(np.float32)
    ours = np.asarray(D.categorical_entropy(jnp.asarray(logits)))
    td = torch.distributions.Categorical(logits=torch.from_numpy(logits))
    np.testing.assert_allclose(ours, td.entropy().numpy(), rtol=1e-5, atol=1e-6)


def test_kumaraswamy_sample_in_range_and_stats():
    alpha = jnp.full((10000,), 1.0)
    beta = jnp.full((10000,), 9.0)
    v = D.kumaraswamy_sample(jax.random.PRNGKey(0), alpha, beta)
    v = np.asarray(v)
    assert (v > 0).all() and (v < 1).all()
    # Kumaraswamy(1, 9) mean = 9*B(1+1/1, 9) = 9/(10*9) * ... = 1/10
    assert abs(v.mean() - 0.1) < 0.01


def test_gumbel_softmax_hard_is_one_hot():
    logits = jax.random.normal(jax.random.PRNGKey(0), (6, 5, 3))
    y = D.gumbel_softmax(jax.random.PRNGKey(1), logits, tau=0.1, hard=True)
    y = np.asarray(y)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-6)
    assert ((y == 0) | (np.abs(y - 1) < 1e-6)).all()


def test_gumbel_softmax_straight_through_gradient():
    logits = jnp.zeros((1, 3))

    def f(lg):
        y = D.gumbel_softmax(jax.random.PRNGKey(0), lg, tau=0.1, hard=True)
        return jnp.sum(y * jnp.arange(3.0))

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
