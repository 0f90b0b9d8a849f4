"""Classifier heads: small dense layers over 1024-d YAMNet embeddings.

The reference's model_general_v3 head is a single linear Dense(13)
(`models/model_general_v3/model.py:18-30` + SavedModel variables); here a head
is just a (kernel, bias) pair applied as one MXU matmul. Multiple heads over
shared embeddings batch trivially (the expert-parallel analog the reference
README sketches as future work).
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_head(n_embeddings: int, n_classes: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    std = float(np.sqrt(1.0 / n_embeddings))
    return {
        'head/kernel': (rng.standard_normal((n_embeddings, n_classes))
                        .astype(np.float32) * std),
        'head/bias': np.zeros(n_classes, np.float32),
    }


def apply_head(params: dict, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(B, n_embeddings) embeddings -> (B, n_classes) linear activations.

    HIGHEST precision: head outputs are the user-visible scores and must hold
    the 1e-3 parity budget on TPU.
    """
    kernel = jnp.asarray(params['head/kernel'], jnp.float32)
    bias = jnp.asarray(params['head/bias'], jnp.float32)
    return jnp.matmul(embeddings.astype(jnp.float32), kernel,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + bias
