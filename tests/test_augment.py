"""On-device training augmentation: pure key-driven transforms with
static shapes (train/augment.py), and their integration into the full
train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buzzdetect_tpu.train.augment import (augment_waveforms, default_augment,
                                          mixup, spec_mask)


def test_augment_waveforms_gain_and_shift():
    key = jax.random.PRNGKey(0)
    w = jnp.ones((4, 16000), jnp.float32)
    out = augment_waveforms(key, w, gain_db=6.0)
    assert out.shape == w.shape and out.dtype == w.dtype
    # a constant signal circular-shifts to itself: only gain remains, and
    # gain is bounded by +-6 dB
    per_clip = np.asarray(out)[:, 0]
    assert np.all(per_clip >= 10 ** (-6 / 20) - 1e-6)
    assert np.all(per_clip <= 10 ** (6 / 20) + 1e-6)
    # per-clip gains differ (it's per-sample randomness, not one scalar)
    assert len(np.unique(np.round(per_clip, 6))) > 1
    # deterministic per key
    again = augment_waveforms(key, w, gain_db=6.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(again))


def test_augment_waveforms_shift_is_circular():
    key = jax.random.PRNGKey(3)
    ramp = jnp.arange(16000, dtype=jnp.float32)[None, :].repeat(8, axis=0)
    out = np.asarray(augment_waveforms(key, ramp, gain_db=0.0))
    for row in out:
        # a circular shift of a permutation keeps the multiset intact
        np.testing.assert_array_equal(np.sort(row), np.arange(16000))


def test_mixup_convexity_and_labels():
    key = jax.random.PRNGKey(1)
    w = jnp.stack([jnp.zeros(100), jnp.ones(100)]).astype(jnp.float32)
    y = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    mx, my = mixup(key, w, y, alpha=0.3)
    # every mixed sample is a convex combination: values within [0, 1],
    # labels rows sum to 1 (two one-hot parents)
    assert np.all(np.asarray(mx) >= -1e-6) and np.all(np.asarray(mx) <= 1 + 1e-6)
    np.testing.assert_allclose(np.asarray(my).sum(axis=1), 1.0, atol=1e-6)
    # lambda folded to >= 0.5: each clip remains its own majority component
    assert np.asarray(my)[0, 0] >= 0.5 - 1e-6
    assert np.asarray(my)[1, 1] >= 0.5 - 1e-6


def test_spec_mask_zeroes_bounded_regions():
    key = jax.random.PRNGKey(2)
    p = jnp.ones((3, 2, 96, 64), jnp.float32)
    out = np.asarray(spec_mask(key, p, max_time=16, max_freq=8))
    assert out.shape == p.shape
    zeroed = (out == 0.0).mean()
    # masks exist but are bounded (max_time*64 + max_freq*96 of 6144 cells)
    assert zeroed <= (16 * 64 + 8 * 96) / (96 * 64) + 1e-6
    # unmasked cells pass through untouched
    assert set(np.unique(out)) <= {0.0, 1.0}
    # patches get independent masks
    assert not np.array_equal(out[0, 0], out[1, 0]) or \
        not np.array_equal(out[0, 1], out[2, 1])


def test_spec_mask_jits_once_for_any_width():
    # static shapes: the mask is iota-comparison-based, so it compiles
    # under jit with no dynamic-slice shape dependence
    key = jax.random.PRNGKey(4)
    f = jax.jit(lambda k, p: spec_mask(k, p))
    p = jnp.ones((1, 1, 96, 64))
    a = f(key, p)
    b = f(jax.random.PRNGKey(5), p)
    assert a.shape == b.shape == p.shape


def test_full_train_step_with_augmentation_learns():
    """The augmented step runs inside one jitted program and still learns;
    augmented and clean steps produce different losses on the same batch
    (proof the augmentation is live)."""
    import optax
    from buzzdetect_tpu.train.trainer import (init_full_train,
                                              make_full_train_step)
    rng = np.random.default_rng(0)
    clips = (rng.standard_normal((4, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((4, 2)) > 0.5).astype(np.float32)
    params, opt_state, tx = init_full_train(2, seed=0, learning_rate=1e-3)

    clean = make_full_train_step(tx, augment=False)
    aug = make_full_train_step(tx, augment=True)

    def fresh(tree):  # the steps donate their (params, opt_state) buffers
        return jax.tree.map(jnp.array, tree)

    _, _, loss_clean = clean(fresh(params), fresh(opt_state),
                             jnp.asarray(clips), jnp.asarray(labels))
    _, _, loss_aug = aug(fresh(params), fresh(opt_state),
                         jnp.asarray(clips), jnp.asarray(labels),
                         jax.random.PRNGKey(7))
    assert float(loss_clean) != pytest.approx(float(loss_aug), abs=1e-9)

    # and a short augmented training run reduces loss
    from buzzdetect_tpu.train.clips import train_full_model
    _, _, losses = train_full_model(clips, labels, epochs=6, batch_size=4,
                                    learning_rate=1e-3, augment=True,
                                    log=lambda *_: None)
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_augmented_checkpoint_resume_bit_identical(tmp_path):
    """Per-step keys derive from (seed, global step) and the step counter
    rides the checkpoint, so an interrupted AUGMENTED run resumes on the
    exact key stream -> bit-identical parameters."""
    from buzzdetect_tpu.train.clips import train_full_model
    rng = np.random.default_rng(5)
    clips = (rng.standard_normal((4, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((4, 2)) > 0.5).astype(np.float32)
    kw = dict(batch_size=2, learning_rate=1e-3, augment=True,
              log=lambda *_: None)

    gold_raw, _, gold_losses = train_full_model(clips, labels, epochs=2,
                                                **kw)
    ckpt = str(tmp_path / 'work')
    train_full_model(clips, labels, epochs=1, checkpoint_dir=ckpt, **kw)
    raw, _, losses = train_full_model(clips, labels, epochs=2,
                                      checkpoint_dir=ckpt, **kw)
    assert losses == gold_losses
    for k in gold_raw:
        np.testing.assert_array_equal(raw[k], gold_raw[k], err_msg=k)
