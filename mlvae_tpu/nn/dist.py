"""Distribution math used by the VAE family, as pure jnp functions.

Replaces the reference's ``torch.distributions`` usages with TPU PRNG
(`jax.random`, threefry) and closed-form KLDs:

* normal reparameterization          (ref ``modules/vanilla_vae.py:37-40``)
* KLD to N(0,1)                      (ref ``modules/vanilla_vae.py:42-45``)
* learned-prior Gaussian KLD         (ref ``modules/gmm_vae.py:58-67``)
* hard Gumbel-softmax, tau=0.1       (ref ``modules/gmm_vae.py:31``)
* Kumaraswamy inverse-CDF sampling   (ref ``modules/boundary_detector.py:59-67``)
* Beta-Beta KL divergence            (ref ``modules/boundary_detector.py:94-103``)
* categorical sample/logprob/entropy (ref ``models/MD_VAE/model.py:122-150``,
  ``models/MD_VAE_sfl/model.py:171-181``)
* Gaussian NLL reconstruction        (ref ``modules/decoder.py:40-47``)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

LOG_2PI = math.log(2.0 * math.pi)


def _f32(x):
    """AMP policy (mirrors torch autocast's fp32 op list): every function in
    this module computes its log/exp/pow/special-function math in f32 even
    when activations stream bf16 — bf16 eps-clamps collapse (1 - 1e-12 == 1
    in bf16) and produce inf/NaN losses.  Per-element LOSSES return f32 (the
    masked reductions accumulate exactly); SAMPLES that feed matmuls are
    cast back to the input dtype at the call site."""
    return jnp.asarray(x, jnp.float32)


# -- Gaussian ---------------------------------------------------------------

def reparameterize(rng, mean, log_var):
    std = jnp.exp(0.5 * _f32(log_var))
    eps = jax.random.normal(rng, mean.shape, jnp.float32)
    return (eps * std + _f32(mean)).astype(mean.dtype)


def kld_std_normal(mean, log_var):
    """Per-element KL(q(z)=N(mean,var) || N(0,1)); f32."""
    mean, log_var = _f32(mean), _f32(log_var)
    return -0.5 * (1.0 + log_var - jnp.square(mean) - jnp.exp(log_var))


def kld_gaussian_prior(prior_mean, prior_log_var, mean, log_var, eps=1e-5):
    """Per-element KL between diag Gaussians with a learned prior.

    Matches the reference's eps-regularized form (``gmm_vae.py:62-66``); f32.
    """
    prior_mean, prior_log_var = _f32(prior_mean), _f32(prior_log_var)
    mean, log_var = _f32(mean), _f32(log_var)
    return -0.5 * (
        1.0
        + log_var
        - prior_log_var
        - (jnp.exp(log_var) + jnp.square(mean - prior_mean))
        / (jnp.exp(prior_log_var) + eps)
    )


def gaussian_nll(mean, log_var, target, eps=1e-5):
    """Per-element negative Gaussian log-likelihood (``decoder.py:40-43``); f32."""
    mean, log_var, target = _f32(mean), _f32(log_var), _f32(target)
    ll = -0.5 * (
        LOG_2PI + log_var + jnp.square(target - mean) / (jnp.exp(log_var) + eps)
    )
    return -ll


# -- Gumbel softmax ----------------------------------------------------------

def gumbel_softmax(rng, logits, tau: float = 1.0, hard: bool = False):
    in_dtype = logits.dtype
    logits = _f32(logits)
    g = jax.random.gumbel(rng, logits.shape, jnp.float32)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    if not hard:
        return y_soft.astype(in_dtype)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    # straight-through estimator
    return (y_hard + y_soft - jax.lax.stop_gradient(y_soft)).astype(in_dtype)


# -- Kumaraswamy / Beta -------------------------------------------------------

def kumaraswamy_sample(rng, alpha, beta, u_lo=0.01, u_span=0.98, eps=1e-5):
    """Inverse-CDF sample v = (1 - u^(1/beta))^(1/alpha), u ~ U(0.01, 0.99).

    The squashing of u and v mirrors the reference exactly
    (``boundary_detector.py:61-67``).
    """
    alpha, beta = _f32(alpha), _f32(beta)
    u = jax.random.uniform(rng, alpha.shape, jnp.float32)
    u = u * u_span + u_lo
    v = jnp.power(1.0 - jnp.power(u, 1.0 / beta), 1.0 / alpha)
    return v * (1.0 - 2.0 * eps) + eps


def kld_beta(alpha, beta, prior_alpha, prior_beta):
    """Closed-form KL(Beta(alpha,beta) || Beta(a0,b0)).

    Equivalent to ``torch.distributions.kl_divergence(Beta, Beta)``.
    """
    alpha, beta = _f32(alpha), _f32(beta)
    a0 = jnp.asarray(prior_alpha, jnp.float32)
    b0 = jnp.asarray(prior_beta, jnp.float32)

    def log_beta_fn(a, b):
        return gammaln(a) + gammaln(b) - gammaln(a + b)

    return (
        log_beta_fn(a0, b0)
        - log_beta_fn(alpha, beta)
        + (alpha - a0) * digamma(alpha)
        + (beta - b0) * digamma(beta)
        + (a0 - alpha + b0 - beta) * digamma(alpha + beta)
    )


# -- Bernoulli / BCE ----------------------------------------------------------

def bce(probs, targets, eps=1e-7):
    """Elementwise binary cross entropy on probabilities (torch F.binary_cross_entropy).

    torch clamps log terms at -100; we clamp the probabilities which gives the
    same values for the reference's inputs (probs are already in (eps, 1-eps)).
    eps must be >= ~1e-7: ``1 - 1e-12`` rounds to exactly 1.0 in f32, which
    would make the upper clamp a no-op and let ``log1p(-p)`` return -inf.
    """
    probs, targets = _f32(probs), _f32(targets)
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def bce_with_logits(logits, targets):
    """Elementwise BCE-with-logits, numerically stable (torch semantics); f32."""
    logits, targets = _f32(logits), _f32(targets)
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


# -- Categorical --------------------------------------------------------------

def categorical_sample(rng, logits):
    return jax.random.categorical(rng, logits, axis=-1)


def categorical_log_prob(logits, value):
    """log p(value) for integer ``value`` under Categorical(logits); f32."""
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    value = value.astype(jnp.int32)
    return jnp.take_along_axis(logp, value[..., None], axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_ll_onehot(logits, one_hot):
    """<log_softmax(logits), one_hot> — the reference's bmm trick
    (``utils/data_utils.py:184-208``).  The reference contracts
    ``Categorical(logits=...).logits``, which torch NORMALIZES to
    log-probabilities at construction, so for a one-hot target this is the
    exact log-likelihood (and its logit gradient is onehot − softmax, the
    proper cross-entropy gradient — raw-logit contraction would push the
    selected logit unboundedly); f32."""
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return jnp.sum(logp * _f32(one_hot), axis=-1)
