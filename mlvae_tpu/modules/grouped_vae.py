"""Multi-level VAE with grouped latents (BASELINE.json gate config
"Multi-level VAE: grouped latents (utterance-level + frame/phoneme-level)
with group-ELBO").

Two latent groups over one utterance:

* a FRAME-level latent per time step (local content), as in the
  reference's VAE branches (``modules/vanilla_vae.py`` contract), and
* an UTTERANCE-level latent shared by all frames of the utterance
  (speaker/style), inferred from a LENGTH-MASKED mean-pool of the trunk
  features — the group posterior accumulates evidence from every valid
  frame, the multi-level-VAE analogue of Bouchacourt et al.'s grouped
  observations.

The decoder consumes [frame latent ; broadcast utterance latent].  The
group-ELBO counts the utterance KLD ONCE per utterance while the
reconstruction and frame KLD are masked sums over valid frames
(:func:`group_elbo`).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import Linear
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock
from mlvae_tpu.utils.tensor import length_mask


class GroupedLatentVAE(Module):
    def __init__(self, fc_sizes: Sequence[int], frame_latent_size: int,
                 utt_latent_size: int, dec_fc_sizes: Sequence[int]):
        super().__init__()
        self.fc_sizes = [int(s) for s in fc_sizes]
        self.frame_latent_size = int(frame_latent_size)
        self.utt_latent_size = int(utt_latent_size)
        trunk_out = self.fc_sizes[-1]

        self.trunk = self.child(
            "trunk", FCBlock(self.fc_sizes, end_activation=True))
        self.frame_mean_fc = self.child(
            "frame_mean_fc", Linear(trunk_out, frame_latent_size))
        self.frame_log_var_fc = self.child(
            "frame_log_var_fc", Linear(trunk_out, frame_latent_size))
        self.utt_mean_fc = self.child(
            "utt_mean_fc", Linear(trunk_out, utt_latent_size))
        self.utt_log_var_fc = self.child(
            "utt_log_var_fc", Linear(trunk_out, utt_latent_size))
        dec_sizes = ([frame_latent_size + utt_latent_size]
                     + [int(s) for s in dec_fc_sizes])
        self.dec = self.child("dec", FCBlock(dec_sizes))

    def apply(self, params, feats, feat_lens, rng=None,
              train: bool = False, **kwargs):
        """feats (B, T, C); feat_lens relative lengths (B,)."""
        stream = RngStream.ensure(rng)
        h = self.trunk.apply(params["trunk"], feats)  # (B, T, D)

        # frame-level posterior (per time step)
        f_mean = self.frame_mean_fc.apply(params["frame_mean_fc"], h)
        f_log_var = self.frame_log_var_fc.apply(
            params["frame_log_var_fc"], h)
        z_frame = D.reparameterize(stream.next(), f_mean, f_log_var)

        # utterance-level (group) posterior: masked mean-pool of the trunk
        mask = length_mask(feat_lens, h.shape[1], h.dtype)  # (B, T)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        pooled = (h * mask[..., None]).sum(axis=1) / denom  # (B, D)
        u_mean = self.utt_mean_fc.apply(params["utt_mean_fc"], pooled)
        u_log_var = self.utt_log_var_fc.apply(
            params["utt_log_var_fc"], pooled)
        z_utt = D.reparameterize(stream.next(), u_mean, u_log_var)

        # decode from [frame ; broadcast utterance] latents
        T = feats.shape[1]
        z = jnp.concatenate(
            [z_frame, jnp.broadcast_to(
                z_utt[:, None, :], (z_utt.shape[0], T, z_utt.shape[-1]))],
            axis=-1)
        recon = self.dec.apply(params["dec"], z)

        return {
            "frame_mean": f_mean,
            "frame_log_var": f_log_var,
            "utt_mean": u_mean,
            "utt_log_var": u_log_var,
            "sampled_frame_h": z_frame,
            "sampled_utt_h": z_utt,
            "recon": recon,
            "frame_kld_loss": D.kld_std_normal(f_mean, f_log_var),
            "utt_kld_loss": D.kld_std_normal(u_mean, u_log_var),
            "recon_loss": (recon - feats) ** 2,
        }


def group_elbo(outputs, feats, feat_lens, kld_weight: float = 1.0):
    """Negative group-ELBO per utterance, averaged over the batch: masked
    frame sums for reconstruction + frame KLD, and the utterance KLD
    counted ONCE per utterance (not per frame)."""
    T = feats.shape[1]
    mask = length_mask(feat_lens, T, feats.dtype)  # (B, T)
    recon = (outputs["recon_loss"].sum(-1) * mask).sum(-1)      # (B,)
    f_kld = (outputs["frame_kld_loss"].sum(-1) * mask).sum(-1)  # (B,)
    u_kld = outputs["utt_kld_loss"].sum(-1)                     # (B,)
    return jnp.mean(recon + kld_weight * (f_kld + u_kld))
