"""Seeded A/B test of the SFL (REINFORCE) estimator math vs the reference
(SURVEY §7 hard part 6: "easy to silently get wrong; needs seeded A/B tests
vs reference math").

The torch oracle reproduces ``MD_VAE_sfl/model.py:136-182`` literally,
including ``compute_categorical_ll``'s bmm over ``Categorical.logits``
(``utils/data_utils.py:184-208``) — which torch NORMALIZES to log-probs at
construction.  We compare both the loss values and the gradients w.r.t.
pi_logits and the baseline head output, since the whole difficulty is
stop_gradient placement mirroring every ``.detach()``.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mlvae_tpu.nn import dist as D  # noqa: E402

B, T, C = 3, 7, 5
RW, KW, PW = 0.8, 1.3, 0.6  # recon / vae_kld / pi_nll weights


def _inputs():
    rng = np.random.default_rng(0)
    return {
        "pi_logits": rng.normal(size=(B, T, 2)).astype(np.float32),
        "baseline": rng.normal(size=(B, T)).astype(np.float32),
        # per-element branch losses as emitted by encoder/decoder (B, T, C)
        "kld": rng.uniform(0.1, 2.0, size=(B, T, C)).astype(np.float32),
        "recon": rng.uniform(0.1, 2.0, size=(B, T, C)).astype(np.float32),
        # fixed decoded labels and a fixed pi sample (both binary (B, T))
        "decoded": (rng.uniform(size=(B, T)) > 0.5).astype(np.float32),
        "sampled": (rng.uniform(size=(B, T)) > 0.5).astype(np.float32),
    }


def _torch_compute_categorical_ll(dist, sampled):
    """Literal reference ``compute_categorical_ll`` (data_utils.py:184-208)."""
    logits = dist.logits
    assert logits.shape == sampled.shape
    ll = torch.bmm(
        logits.reshape(logits.shape[0] * logits.shape[1], 1, -1),
        sampled.reshape(logits.shape[0] * logits.shape[1], -1, 1),
    ).reshape(logits.shape[0], logits.shape[1])
    return ll


def _torch_oracle(x):
    pi_logits = torch.tensor(x["pi_logits"], requires_grad=True)
    baseline = torch.tensor(x["baseline"], requires_grad=True)
    kld = torch.tensor(x["kld"])
    recon = torch.tensor(x["recon"])
    decoded = torch.tensor(x["decoded"])
    sampled = torch.tensor(x["sampled"])

    dist = torch.distributions.Categorical(logits=pi_logits)
    pi_nll = -_torch_compute_categorical_ll(
        dist, torch.stack([1 - decoded, decoded], dim=-1))
    nll = -_torch_compute_categorical_ll(
        dist, torch.stack([1 - sampled, sampled], dim=-1))
    vae_kld = torch.mean(kld, dim=-1)
    rec = torch.mean(recon, dim=-1)
    reward = -(RW * rec.detach() + KW * vae_kld.detach()
               + PW * pi_nll.detach())
    rif = (reward - baseline.detach()) * nll
    ent = -dist.entropy()
    base_l = torch.nn.functional.mse_loss(baseline, reward, reduction="none")

    losses = {"pi_nll_loss": pi_nll, "rif_loss": rif,
              "entropy_loss": ent, "baseline_loss": base_l}
    total = sum(v.mean() for v in losses.values())
    total.backward()
    return ({k: v.detach().numpy() for k, v in losses.items()},
            pi_logits.grad.numpy(), baseline.grad.numpy())


def _jax_losses(pi_logits, baseline, x):
    """Our model's estimator (MD_VAE_sfl/model.py compute_forward VAE arm)."""
    decoded = jnp.asarray(x["decoded"])
    sampled = jnp.asarray(x["sampled"])
    pi_nll = -D.categorical_ll_onehot(
        pi_logits, jnp.stack([1 - decoded, decoded], axis=-1))
    nll = -D.categorical_ll_onehot(
        pi_logits, jnp.stack([1 - sampled, sampled], axis=-1))
    vae_kld = jnp.mean(jnp.asarray(x["kld"]), axis=-1)
    rec = jnp.mean(jnp.asarray(x["recon"]), axis=-1)
    reward = -(RW * jax.lax.stop_gradient(rec)
               + KW * jax.lax.stop_gradient(vae_kld)
               + PW * jax.lax.stop_gradient(pi_nll))
    rif = (reward - jax.lax.stop_gradient(baseline)) * nll
    ent = -D.categorical_entropy(pi_logits)
    base_l = jnp.square(baseline - reward)
    return {"pi_nll_loss": pi_nll, "rif_loss": rif,
            "entropy_loss": ent, "baseline_loss": base_l}


def test_sfl_losses_and_gradients_match_torch_reference():
    x = _inputs()
    ref_losses, ref_dpi, ref_dbase = _torch_oracle(x)

    ours = jax.tree_util.tree_map(
        np.asarray,
        _jax_losses(jnp.asarray(x["pi_logits"]), jnp.asarray(x["baseline"]),
                    x))
    for k in ref_losses:
        np.testing.assert_allclose(ours[k], ref_losses[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)

    def total(pi_logits, baseline):
        losses = _jax_losses(pi_logits, baseline, x)
        return sum(jnp.mean(v) for v in losses.values())

    dpi, dbase = jax.grad(total, argnums=(0, 1))(
        jnp.asarray(x["pi_logits"]), jnp.asarray(x["baseline"]))
    np.testing.assert_allclose(np.asarray(dpi), ref_dpi, rtol=1e-5,
                               atol=1e-6, err_msg="d/d pi_logits")
    np.testing.assert_allclose(np.asarray(dbase), ref_dbase, rtol=1e-5,
                               atol=1e-6, err_msg="d/d baseline")


def test_categorical_ll_onehot_is_normalized_log_prob():
    """Regression: torch's ``Categorical.logits`` is log-softmaxed at
    construction, so the reference bmm trick yields true log-probs — a
    raw-logit contraction has the wrong value AND the wrong gradient
    (constant one-hot instead of onehot − softmax)."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 3)).astype(np.float32)
    idx = rng.integers(0, 3, size=(2, 4))
    onehot = np.eye(3, dtype=np.float32)[idx]
    ours = np.asarray(
        D.categorical_ll_onehot(jnp.asarray(logits), jnp.asarray(onehot)))
    theirs = (torch.distributions.Categorical(
        logits=torch.tensor(logits)).log_prob(torch.tensor(idx)).numpy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
