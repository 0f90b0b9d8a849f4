"""Atomic epoch-granular checkpointing for long fine-tunes.

The analysis pipeline's signature capability is kill-anytime resumability
(reference `README.md:14-28`); a multi-hour full-model fine-tune deserves
the same contract. State = the complete training step closure: params,
optimizer state, epoch counter, loss history, and the numpy Generator's
bit state — so an interrupted-and-resumed run replays the exact shuffles
and lands on bit-identical parameters.

Serialization is treedef-free: the caller reconstructs fresh
(params, opt_state) pytrees from its own init path and we splice the saved
leaves in by flatten order, refusing (returning None) on any leaf-count or
shape mismatch — a checkpoint from a different model/optimizer config is
ignored rather than half-loaded. Writes are save-to-temp + os.replace, so
a kill mid-write can never tear the file a resume reads (same discipline
as the writer worker's partial CSVs).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_train_checkpoint(path, params, opt_state, epoch, losses, rng,
                          fingerprint=None):
    """Atomically persist the full training state after ``epoch`` epochs.

    ``fingerprint`` is an arbitrary JSON-able dict of run identity (seed,
    learning rate, dataset size, ...); a resume with a different
    fingerprint ignores the checkpoint instead of silently continuing a
    different training run.
    """
    p_leaves = jax.tree_util.tree_leaves(params)
    o_leaves = jax.tree_util.tree_leaves(opt_state)
    arrays = {f'p{i}': np.asarray(x) for i, x in enumerate(p_leaves)}
    arrays.update({f'o{i}': np.asarray(x) for i, x in enumerate(o_leaves)})
    meta = {'epoch': int(epoch),
            'losses': [float(x) for x in losses],
            'rng_state': rng.bit_generator.state,
            'fingerprint': fingerprint,
            'n_p': len(p_leaves), 'n_o': len(o_leaves)}
    arrays['meta_json'] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8).copy()
    tmp = f'{path}.tmp.{os.getpid()}'
    with open(tmp, 'wb') as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_train_checkpoint(path, params_like, opt_state_like, log=None,
                          fingerprint=None):
    """Restore training state saved by save_train_checkpoint.

    ``params_like``/``opt_state_like`` are freshly initialized pytrees of
    the SAME configuration; their structure receives the saved leaves.
    Returns (params, opt_state, epoch, losses, rng) or None when there is
    no checkpoint or it does not match this training configuration.
    """
    if not os.path.exists(path):
        return None

    def reject(why):
        if log:
            log(f'ignoring checkpoint {path}: {why}')
        return None

    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z['meta_json']).decode())
            p_leaves, p_def = jax.tree_util.tree_flatten(params_like)
            o_leaves, o_def = jax.tree_util.tree_flatten(opt_state_like)
            if meta['n_p'] != len(p_leaves) or meta['n_o'] != len(o_leaves):
                return reject('different model/optimizer configuration')
            if meta.get('fingerprint') != fingerprint:
                return reject('different run (seed/hyperparameters/dataset '
                              'changed) — training fresh')
            new_p = [np.asarray(z[f'p{i}']) for i in range(len(p_leaves))]
            new_o = [np.asarray(z[f'o{i}']) for i in range(len(o_leaves))]
    except Exception as e:  # unreadable/torn/foreign file: train fresh
        return reject(f'unreadable ({type(e).__name__}: {e})')

    for old, new in zip(p_leaves + o_leaves, new_p + new_o):
        if np.shape(old) != new.shape:
            return reject('leaf shape mismatch — different configuration')

    params = jax.tree_util.tree_unflatten(
        p_def, [jnp.asarray(x) for x in new_p])
    opt_state = jax.tree_util.tree_unflatten(
        o_def, [jnp.asarray(x, dtype=np.asarray(old).dtype)
                for x, old in zip(new_o, o_leaves)])
    rng = np.random.default_rng()
    rng.bit_generator.state = meta['rng_state']
    return params, opt_state, int(meta['epoch']), list(meta['losses']), rng
