"""GMM VAE branch (the "mispronunciation" prior).

Parity with reference ``modules/gmm_vae.py``: FC trunk -> per-component
learned prior mean/log-var + posterior mean/log-var heads (N components x C
latent dims flattened to N*C), component weights via HARD Gumbel-softmax at
tau=0.1 (straight-through), reparameterized sampling, and the
eps-regularized per-element KLD between posterior and learned prior.
"""
from __future__ import annotations

from typing import Sequence


from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import Linear
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock


class GMMVAE(Module):
    def __init__(self, fc_sizes: Sequence[int], latent_size: int,
                 num_components: int):
        super().__init__()
        self.fc_sizes = [int(s) for s in fc_sizes]
        self.latent_size = int(latent_size)
        self.num_components = int(num_components)
        NC = self.latent_size * self.num_components
        last = self.fc_sizes[-1]
        self.fc = self.child("fc", FCBlock(self.fc_sizes, end_activation=True))
        self.prior_mean_fc = self.child("prior_mean_fc", Linear(last, NC))
        self.prior_log_var_fc = self.child("prior_log_var_fc", Linear(last, NC))
        self.mean_fc = self.child("mean_fc", Linear(last, NC))
        self.log_var_fc = self.child("log_var_fc", Linear(last, NC))
        self.gmm_weight_fc = self.child(
            "gmm_weight_fc", Linear(last, self.num_components)
        )

    def apply(self, params, feats, rng=None, train: bool = False, **kwargs):
        stream = RngStream.ensure(rng)
        fc_out = self.fc.apply(params["fc"], feats)
        prior_mean = self.prior_mean_fc.apply(params["prior_mean_fc"], fc_out)
        prior_log_var = self.prior_log_var_fc.apply(
            params["prior_log_var_fc"], fc_out
        )
        mean = self.mean_fc.apply(params["mean_fc"], fc_out)
        log_var = self.log_var_fc.apply(params["log_var_fc"], fc_out)
        gmm_weight_logits = self.gmm_weight_fc.apply(
            params["gmm_weight_fc"], fc_out
        )
        gmm_weight = D.gumbel_softmax(
            stream.next(), gmm_weight_logits, tau=0.1, hard=True
        )
        sampled_h = D.reparameterize(stream.next(), mean, log_var)
        loss = D.kld_gaussian_prior(prior_mean, prior_log_var, mean, log_var)
        return {
            "prior_mean": prior_mean,
            "prior_log_var": prior_log_var,
            "mean": mean,
            "log_var": log_var,
            "sampled_h": sampled_h,
            "gmm_weight": gmm_weight,
            "loss": loss,
        }
