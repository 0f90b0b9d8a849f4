"""Training: classifier-head fine-tuning and full-model fine-tuning on TPU
meshes.

The reference ships no training code — its model card records the recipe
(Sequential dense head, Adam, BinaryCrossentropy(from_logits), class weights
from `models/model_general_v3/weights.csv`; see reference
`models/model_general_v3/keras_metadata.pb` strings). This module provides
that capability TPU-first:

* pure-functional train steps (params/opt-state pytrees, optax);
* data parallelism over the batch axis and tensor parallelism over the
  feature/channel axes expressed as GSPMD sharding constraints on a 2-D
  ('data', 'model') mesh — XLA inserts the gradient psums over ICI;
* BatchNorm statistics updated functionally (embed_train).
"""


import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from buzzdetect_tpu.models import yamnet as yamnet_lib
from buzzdetect_tpu.models.heads import apply_head, init_head
from buzzdetect_tpu.ops.frontend import FrontendConfig, log_mel_patches


def bce_with_logits_loss(logits, labels, class_weights=None):
    """Mean binary cross-entropy over classes (multi-label, from logits)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_class = -(labels * log_p + (1.0 - labels) * log_not_p)
    if class_weights is not None:
        per_class = per_class * class_weights
    return jnp.mean(per_class)



# --- head-only training -------------------------------------------------------

def make_head_train_step(tx, mesh: Mesh = None, class_weights=None):
    """Train step over precomputed embeddings: (B,1024) -> BCE loss.

    With a mesh, the batch shards over 'data' and the 1024-d feature axis of
    the head kernel over 'model' (the embedding contraction then runs as a
    sharded matmul with a psum over 'model' — XLA inserts it).
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    def loss_fn(params, embeddings, labels):
        logits = apply_head(params, embeddings)
        return bce_with_logits_loss(logits, labels, cw)

    def step(params, opt_state, embeddings, labels):
        if mesh is not None:
            embeddings = jax.lax.with_sharding_constraint(
                embeddings, NamedSharding(mesh, P('data', 'model')))
            params = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P('model'))
                    if x.ndim == 2 else NamedSharding(mesh, P())),
                params)
        loss, grads = jax.value_and_grad(loss_fn)(params, embeddings, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def train_head(embeddings, labels, n_classes=None, *, epochs=10,
               batch_size=1024, learning_rate=1e-3, class_weights=None,
               seed=0, mesh=None, log_every=0):
    """Fit a dense head on (N, 1024) embeddings with multi-hot (N, C) labels.

    Returns (head_params, losses).
    """
    embeddings = np.asarray(embeddings, np.float32)
    labels = np.asarray(labels, np.float32)
    if len(embeddings) == 0:
        # training on nothing yields all-NaN params with no error (empty
        # mean -> NaN loss/grads); fail like train_full_model does
        raise ValueError('no embeddings to train on — check the labels/'
                         'corpus produced at least one frame')
    n_classes = n_classes or labels.shape[1]
    params = init_head(embeddings.shape[1], n_classes, seed=seed)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    step = make_head_train_step(tx, mesh=mesh, class_weights=class_weights)

    rng = np.random.default_rng(seed)
    losses = []
    n = len(embeddings)
    batch_size = min(batch_size, n)
    steps_per_epoch = -(-n // batch_size)
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            # the remainder batch trains too (a drop-last loop silently
            # skipped up to batch_size-1 shuffled samples per epoch); it is
            # padded by WRAPPING to the next epoch's head of the shuffle —
            # one static batch shape, so jit compiles exactly one program
            idx = order[i:i + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate(
                    [idx, rng.permutation(n)[:batch_size - len(idx)]])
            params, opt_state, loss = step(params, opt_state,
                                           embeddings[idx], labels[idx])
            losses.append(float(loss))
        if log_every and (epoch + 1) % log_every == 0:
            mean_loss = float(np.mean(losses[-steps_per_epoch:]))
            print(f'epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f}')
    return {k: np.asarray(v) for k, v in params.items()}, losses


# --- full-model fine-tuning ----------------------------------------------------

def _shard_activations(x, mesh):
    """Batch over 'data', channels over 'model' (NHWC activations)."""
    if x.ndim == 4:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P('data', None, None, 'model')))
    if x.ndim == 2:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P('data', 'model')))
    return x


def make_full_train_step(tx, mesh: Mesh = None, class_weights=None,
                         framehop_prop: float = 1.0, augment: bool = False):
    """End-to-end train step: raw 16 kHz waveform batch -> frontend ->
    MobileNet (live BatchNorm) -> head -> BCE; grads for every conv kernel,
    BN beta, and the head.

    Sharding (with a 2-D mesh): waveforms/patches/labels shard over 'data'
    (pure DP); the deeper conv channels and the head's feature axis shard
    over 'model' (TP) via GSPMD constraints — XLA places the psums on ICI.

    Returns step(params, opt_state, waveforms, labels) ->
    (params, opt_state, loss). ``params`` = {'yamnet_raw': ..., 'head': ...}.

    With ``augment=True`` the step takes a trailing PRNG key —
    step(params, opt_state, waveforms, labels, key) — and applies the
    on-device augmentation recipe (gain/shift + mixup on waveforms,
    SpecAugment masks on patches, see train/augment.py) INSIDE the jitted
    graph: pure key-driven transforms, static shapes, one program.
    """
    cfg = FrontendConfig().with_framehop(framehop_prop)
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    def forward(trainable, waveforms, labels, mask_key=None):
        patches = log_mel_patches(waveforms, cfg)      # (B, n_patch, 96, 64)
        if mask_key is not None:
            from buzzdetect_tpu.train.augment import spec_mask
            patches = spec_mask(mask_key, patches)
        b, npatch = patches.shape[0], patches.shape[1]
        patches = patches.reshape(b * npatch, *patches.shape[2:])
        if mesh is not None:
            patches = jax.lax.with_sharding_constraint(
                patches[..., None],
                NamedSharding(mesh, P('data', None, None, None)))[..., 0]
        emb, new_raw = yamnet_lib.embed_train(trainable['yamnet_raw'],
                                              patches)
        if mesh is not None:
            emb = _shard_activations(emb, mesh)
        # one clip-level embedding per waveform (mean over its patches)
        emb = emb.reshape(b, npatch, -1).mean(axis=1)
        logits = apply_head(trainable['head'], emb)
        loss = bce_with_logits_loss(logits, labels, cw)
        return loss, new_raw

    def step(params, opt_state, waveforms, labels, key=None):
        if mesh is not None:
            waveforms = jax.lax.with_sharding_constraint(
                waveforms, NamedSharding(mesh, P('data', None)))
            labels = jax.lax.with_sharding_constraint(
                labels, NamedSharding(mesh, P('data', None)))
        mask_key = None
        if augment:
            from buzzdetect_tpu.train.augment import default_augment
            k_wave, mask_key = jax.random.split(key)
            waveforms, labels = default_augment(k_wave, waveforms, labels)
        (loss, new_raw), grads = jax.value_and_grad(
            forward, has_aux=True)(params, waveforms, labels, mask_key)
        # BN running stats are data, not parameters: adopt, don't descend
        grads['yamnet_raw'] = {
            k: (jnp.zeros_like(v) if k.endswith(('bn_mean', 'bn_var')) else v)
            for k, v in grads['yamnet_raw'].items()}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params['yamnet_raw'] = {
            k: (new_raw[k] if k.endswith(('bn_mean', 'bn_var')) else v)
            for k, v in params['yamnet_raw'].items()}
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def init_full_train(n_classes: int, seed: int = 0, learning_rate: float = 1e-4):
    """Fresh params + optimizer for full-model fine-tuning."""
    raw = {k: jnp.asarray(v)
           for k, v in yamnet_lib.init_raw_params(seed=seed).items()}
    head = {k: jnp.asarray(v)
            for k, v in init_head(yamnet_lib.N_EMBEDDINGS, n_classes,
                                  seed=seed).items()}
    params = {'yamnet_raw': raw, 'head': head}
    tx = optax.adam(learning_rate)
    return params, tx.init(params), tx
