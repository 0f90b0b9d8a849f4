"""Ahead-of-time model export: the fused classify graph as a serialized
StableHLO artifact (jax.export).

Serving deployments can load the artifact and run inference without the
model code, weight bundles, or tracing — the weights are baked into the
graph as constants, shapes are fixed at export time, and the artifact is
portable across hosts (and forward-compatible per StableHLO guarantees).
"""

import json
import os

import numpy as np


def export_classifier(modelname: str, chunk_seconds: float,
                      framehop_prop: float = 1.0,
                      platforms=('cpu', 'tpu'),
                      transfer_dtype: str = 'int16',
                      conv: str = 'xla',
                      conv_precision: str = 'auto'):
    """Build and export the waveform->scores graph for a fixed chunk shape.

    ``conv='pallas'`` bakes the fused conv-tail kernel into the artifact
    (measured 1.31x on the embed, docs/tuning.md) — TPU-only: a Mosaic
    custom call cannot load on CPU, so it requires platforms=('tpu',).

    ``conv_precision`` ('auto'|'high'|'highest') is resolved against THIS
    export's ``conv`` argument — not the live model's auto-resolved path,
    which depends on the BUILD host's backend: an export built on a CPU
    host would otherwise bake the out-of-budget emulated-HIGH kernels
    into a pallas artifact (or HIGHEST into an XLA artifact meant to run
    the shipped HIGH default).

    Returns (serialized_bytes, meta_dict).
    """
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.models.registry import load_model
    from buzzdetect_tpu.ops.frontend import padded_length, num_patches

    model = load_model(modelname, framehop_prop=framehop_prop,
                       initialize=True, transfer_dtype=transfer_dtype)
    clf = model.classifier
    cfg = clf.cfg
    fl = model.embedder.framelength_s
    n_frames = round(chunk_seconds / fl)
    if n_frames < 1:
        raise ValueError(f'chunk_seconds={chunk_seconds} snaps to zero '
                         f'frames (framelength {fl}s)')
    # integer sample math: int(n_frames * 0.96 * 16000) would truncate a
    # sample off the inexact binary product (960.0 -> 15359999)
    chunk_seconds = round(n_frames * fl, 6)
    n_samples = n_frames * int(round(fl * 16000))
    target = padded_length(n_samples, cfg)

    if conv not in ('xla', 'pallas'):
        raise ValueError("conv must be 'xla' or 'pallas'")
    if conv == 'pallas' and set(platforms) != {'tpu'}:
        raise ValueError("conv='pallas' exports are TPU-only; pass "
                         "platforms=('tpu',)")
    if conv_precision not in ('auto', 'high', 'highest'):
        raise ValueError("conv_precision must be 'auto', 'high' or "
                         "'highest'")
    if conv_precision == 'auto':
        if not clf._conv_precision_auto:
            # an EXPLICIT pin (config_model.json conv_precision, honored
            # by the registry like its frontend/compute pins) survives
            # into the artifact — the operator validated the bundle under
            # that precision
            conv_precision = clf.conv_precision
        else:
            # the product rule, applied to the export's own conv path
            # (ChunkClassifier.__init__ has the measurements)
            conv_precision = 'highest' if conv == 'pallas' else 'high'

    params = clf.params  # baked in as constants
    from buzzdetect_tpu.models.classifier import _classify_padded

    def forward(waveform):
        # honor the model's configured frontend/compute dtype — an export
        # built with defaults would silently diverge from the live model
        # the user validated (classifier.py forbids exactly that
        # substitution on the serving path)
        return _classify_padded(params, waveform, cfg,
                                compute_dtype=clf.compute_dtype,
                                frontend=clf.frontend, conv=conv,
                                conv_precision=conv_precision)

    dtype = {'int16': jnp.int16, 'mulaw': jnp.int8}.get(
        transfer_dtype, jnp.float32)
    spec = jax.ShapeDtypeStruct((target,), dtype)
    exported = jax.export.export(jax.jit(forward),
                                 platforms=list(platforms))(spec)
    meta = {
        'modelname': modelname,
        'classes': model.config['classes'],
        'chunk_seconds': chunk_seconds,
        'input_samples': target,
        'input_dtype': transfer_dtype,
        'framehop_prop': framehop_prop,
        # the EFFECTIVE patch stride in seconds (snapped to the 10 ms
        # spectrogram grid) — consumers must derive timestamps from this,
        # not framehop_prop * 0.96, or they drift off the analyzed frames
        # whenever 96*framehop_prop is not an integer
        'framehop_s': cfg.patch_hop_seconds,
        'n_patches': num_patches(n_samples, cfg),
        'platforms': list(platforms),
        'conv': conv,
        'conv_precision': conv_precision,
        'samplerate': 16000,
    }
    return exported.serialize(), meta


def save_exported(dir_out: str, blob: bytes, meta: dict):
    os.makedirs(dir_out, exist_ok=True)
    with open(os.path.join(dir_out, 'classify.stablehlo'), 'wb') as f:
        f.write(blob)
    with open(os.path.join(dir_out, 'export_meta.json'), 'w') as f:
        json.dump(meta, f, indent=2)
    return dir_out


def load_exported(dir_in: str):
    """Load a serving artifact -> (callable(waveform)->scores, meta)."""
    import jax
    with open(os.path.join(dir_in, 'classify.stablehlo'), 'rb') as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(dir_in, 'export_meta.json')) as f:
        meta = json.load(f)

    def call(waveform):
        waveform = np.asarray(waveform)
        assert len(waveform) == meta['input_samples'], \
            f"expected {meta['input_samples']} samples"
        # slice to the real patch count, exactly like the live predict()
        # path: at framehop_prop > 1 the padded graph emits one extra
        # pure-padding patch whose score row is not real audio
        return exported.call(waveform)[:meta['n_patches']]

    return call, meta
