"""On-device training augmentation: pure, jittable, key-driven.

Field corpora are small (hundreds of labeled clips), so full-model
fine-tunes overfit fast; these are the standard audio countermeasures,
expressed TPU-first — every transform is a pure function of a PRNG key
with static shapes, so the whole augmentation pipeline lives INSIDE the
jitted train step (zero host passes, zero recompilation across steps):

* waveform: random gain (uniform in dB) and random circular time shift —
  a bee does not get quieter or earlier-in-clip by being a different bee;
* mixup (Zhang et al. 2017): convex combinations of clips and their
  multi-hot labels within the batch — the strongest small-data
  regularizer here because label algebra is exact for multi-label BCE;
* SpecAugment-style masking (Park et al. 2019): random time and mel-band
  masks on the (96, 64) patches.

The reference ships no training code at all (SURVEY §2a); this extends
the training subsystem the same way `train/trainer.py` does.
"""

import jax
import jax.numpy as jnp


def augment_waveforms(key, waveforms, *, gain_db: float = 6.0,
                      max_shift_s: float = 0.25, sample_rate: int = 16000):
    """Random per-clip gain in [-gain_db, +gain_db] and circular shift in
    [-max_shift_s, +max_shift_s]. (B, T) -> (B, T), same shape/dtype."""
    b = waveforms.shape[0]
    k_gain, k_shift = jax.random.split(key)
    gains = 10.0 ** (jax.random.uniform(
        k_gain, (b, 1), minval=-gain_db, maxval=gain_db) / 20.0)
    max_shift = int(max_shift_s * sample_rate)
    shifts = jax.random.randint(k_shift, (b,), -max_shift, max_shift + 1)
    rolled = jax.vmap(lambda w, s: jnp.roll(w, s))(waveforms, shifts)
    return (rolled * gains).astype(waveforms.dtype)


def mixup(key, waveforms, labels, *, alpha: float = 0.3):
    """Mix each clip with a random partner: x = l*x_i + (1-l)*x_j, same
    for the multi-hot labels. Beta(alpha, alpha) mixing weights."""
    b = waveforms.shape[0]
    k_perm, k_lam = jax.random.split(key)
    perm = jax.random.permutation(k_perm, b)
    lam = jax.random.beta(k_lam, alpha, alpha, (b,))
    # fold toward the original clip so every sample keeps its own identity
    # as the majority component (standard practice for small batches)
    lam = jnp.maximum(lam, 1.0 - lam)
    lw = lam[:, None]
    mixed_x = lw * waveforms + (1.0 - lw) * waveforms[perm]
    mixed_y = lw * labels + (1.0 - lw) * labels[perm]
    return mixed_x.astype(waveforms.dtype), mixed_y


def spec_mask(key, patches, *, n_time_masks: int = 1, max_time: int = 16,
              n_freq_masks: int = 1, max_freq: int = 8):
    """SpecAugment-style zero masks on (..., 96, 64) log-mel patches.

    Static shapes: masks are built with iota comparisons (no dynamic
    slicing), so any mask width in [0, max] compiles to one program.
    """
    t_dim, f_dim = patches.shape[-2], patches.shape[-1]
    lead = patches.shape[:-2]
    n_lead = 1
    for d in lead:
        n_lead *= d
    flat = patches.reshape(n_lead, t_dim, f_dim)

    def mask_one(p, key):
        def one_axis(p, key, axis_len, n_masks, max_width, axis):
            for i in range(n_masks):
                key, k_w, k_at = jax.random.split(key, 3)
                width = jax.random.randint(k_w, (), 0, max_width + 1)
                at = jax.random.randint(k_at, (), 0,
                                        jnp.maximum(axis_len - width, 1))
                idx = jnp.arange(axis_len)
                keep = (idx < at) | (idx >= at + width)
                shape = [1, 1]
                shape[axis] = axis_len
                p = p * keep.reshape(shape)
            return p, key
        p, key = one_axis(p, key, t_dim, n_time_masks, max_time, 0)
        p, _ = one_axis(p, key, f_dim, n_freq_masks, max_freq, 1)
        return p

    keys = jax.random.split(key, n_lead)
    return jax.vmap(mask_one)(flat, keys).reshape(patches.shape)


def default_augment(key, waveforms, labels):
    """The standard recipe: gain + shift, then mixup. Returns
    (waveforms, labels). Patch masking is applied separately by the train
    step (it needs the post-frontend representation)."""
    k1, k2 = jax.random.split(key)
    waveforms = augment_waveforms(k1, waveforms)
    return mixup(k2, waveforms, labels)
