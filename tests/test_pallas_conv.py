"""Fused Pallas conv tail: parity with the XLA sep-conv stack.

Interpreter mode on the CPU test mesh here; compiled-mode attestation on real
hardware lives in tools/pallas_conv_tpu_probe.py (results in docs/tuning.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from buzzdetect_tpu.models import yamnet as yam
from buzzdetect_tpu.ops.pallas_conv import fused_tail, tail_specs

RNG = np.random.default_rng(11)


def xla_tail(params, x, start_layer=8, stop_layer=None, gap=True):
    """Reference: the same layers run through the production XLA path."""
    specs = tail_specs(start_layer, stop_layer)
    for s in specs:
        dw = params[f'{s.name}/depthwise_conv/kernel']
        dwb = params[f'{s.name}/depthwise_conv/bias']
        pw = params[f'{s.name}/pointwise_conv/kernel']
        pwb = params[f'{s.name}/pointwise_conv/bias']
        x = yam._conv2d(x, jnp.asarray(dw), s.stride, depthwise=True)
        x = jax.nn.relu(x + dwb)
        x = yam._conv2d(x, jnp.asarray(pw), 1)
        x = jax.nn.relu(x + pwb)
    return jnp.mean(x, axis=(1, 2)) if gap else x


def tail_input(b, start_layer=8, seed=3):
    s0 = tail_specs(start_layer)[0]
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, s0.h, s0.w, s0.c_in)).astype(np.float32)


@pytest.mark.parametrize('start_layer', [8, 13])
def test_fused_tail_matches_xla(start_layer):
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    x = tail_input(5, start_layer)
    ref = np.asarray(xla_tail(params, jnp.asarray(x), start_layer))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, jnp.asarray(x),
                                    start_layer=start_layer,
                                    block_patches=4, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_fused_tail_emulated_high_tracks_f32():
    """Precision.HIGH inside the kernel: Mosaic's dot lowering refuses
    HIGH outright ("Unsupported dot precision: HIGH", probed 2026-08-20),
    so _pw_dot EMULATES it — hi/lo bf16 operand splits and the same three
    one-pass products XLA's HIGH lowers to. The result must track the
    exact-f32 reference to ~HIGH-grade error (far tighter than bf16), and
    the hi/lo weight split must be byte-neutral (2xbf16 = 1xf32)."""
    from buzzdetect_tpu.ops.pallas_conv import _split_hi_lo
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    x = tail_input(5, 8)
    ref = np.asarray(xla_tail(params, jnp.asarray(x), 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, jnp.asarray(x), start_layer=8,
                                    block_patches=4, interpret=True,
                                    precision=jax.lax.Precision.HIGH))
    assert got.shape == ref.shape
    # measured 1.3e-6 on embeddings of unit-scale inputs (CPU interpret);
    # 1e-4 keeps margin for compiled-mode accumulation differences while
    # still 100x tighter than the bf16 test's tolerance
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    # the split reconstructs the weight to ~16 mantissa bits and carries
    # the same bytes as the f32 original
    w = jnp.asarray(RNG.standard_normal((64, 128)).astype(np.float32))
    s = _split_hi_lo(w)
    assert s.dtype == jnp.bfloat16 and s.shape == (2, 64, 128)
    recon = s[0].astype(jnp.float32) + s[1].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(w),
                               atol=2e-5, rtol=2e-5)


def test_embed_high_precision_pallas_tracks_xla():
    """The product wiring: embed(conv='pallas', conv_precision='high')
    reaches the emulated-HIGH kernels through the packed front AND both
    tail blocks, staying at HIGH-grade distance from the f32 oracle."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    patches = RNG.standard_normal((8, 96, 64)).astype(np.float32) * 0.5
    ref = np.asarray(yam.embed(params, jnp.asarray(patches)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(yam.embed(params, jnp.asarray(patches),
                                   conv='pallas', conv_precision='high'))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_fused_tail_bf16_compiles_and_tracks_f32():
    """bf16 compute: the kernel keeps VPU activations f32 (Mosaic cannot
    rotate non-32-bit vectors) and runs only the MXU dots in bf16, so its
    output tracks the f32 reference within bf16 rounding."""
    import jax.numpy as jnp
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    x = tail_input(4, 13)
    ref = np.asarray(xla_tail(params, jnp.asarray(x), 13))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, jnp.asarray(x), start_layer=13,
                                    block_patches=4,
                                    compute_dtype=jnp.bfloat16,
                                    interpret=True))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, atol=0.02)


def test_fused_tail_no_gap_and_padding():
    """gap=False returns the last layer's activations; B not divisible by
    block_patches still yields exactly B rows."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    x = tail_input(3, 13)
    ref = np.asarray(xla_tail(params, jnp.asarray(x), 13, gap=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, jnp.asarray(x), start_layer=13,
                                    block_patches=4, gap=False,
                                    interpret=True))
    assert got.shape == (3, ref.shape[1] * ref.shape[2], ref.shape[3])
    np.testing.assert_allclose(
        got, ref.reshape(got.shape), atol=2e-4, rtol=1e-5)


def test_fused_mid_block_matches_xla():
    """The layers-4..7 block (stop_layer) matches XLA, flattened-spatial out."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    s0 = tail_specs(4, 8)[0]
    x = RNG.standard_normal((5, s0.h, s0.w, s0.c_in)).astype(np.float32)
    ref = np.asarray(xla_tail(params, jnp.asarray(x), 4, 8, gap=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, jnp.asarray(x), start_layer=4,
                                    stop_layer=8, block_patches=4, gap=False,
                                    interpret=True))
    assert got.shape == (5, ref.shape[1] * ref.shape[2], ref.shape[3])
    np.testing.assert_allclose(
        got, ref.reshape(got.shape), atol=2e-4, rtol=1e-5)


def test_two_block_embed_matches_xla():
    """embed(conv='pallas') with a (4..7)+(8..14) block chain matches the
    all-XLA embed — the layout being measured for the production default."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=9))
    patches = RNG.standard_normal((5, 96, 64)).astype(np.float32) * 0.5
    ref = np.asarray(yam.embed(params, jnp.asarray(patches)))
    old = yam.PALLAS_BLOCKS
    try:
        yam.PALLAS_BLOCKS = ((4, 8, 4), (8, None, 4))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(yam.embed(params, jnp.asarray(patches),
                                       conv='pallas'))
    finally:
        yam.PALLAS_BLOCKS = old
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_tail_specs_validation():
    with pytest.raises(ValueError, match='empty layer range'):
        tail_specs(8, 8)
    with pytest.raises(ValueError, match='not a sep layer'):
        tail_specs(1, 3)
    specs = tail_specs(4, 8)
    assert [s.index for s in specs] == [4, 5, 6, 7]
    assert (specs[0].h, specs[0].w, specs[0].c_in) == (24, 16, 128)
    assert (specs[-1].h_out, specs[-1].w_out, specs[-1].c_out) == (6, 4, 512)


def test_fused_tail_whole_model_parity():
    """Full embed with the tail swapped in matches embed() end to end."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=9))
    patches = RNG.standard_normal((4, 96, 64)).astype(np.float32) * 0.5
    ref = np.asarray(yam.embed(params, jnp.asarray(patches)))

    # run layers 1-7 through the XLA path, then the fused tail
    x = jnp.asarray(patches)[..., None]
    for key, kind, stride, _shape in yam._conv_shapes():
        if int(key.split('/')[0][5:]) >= 8:
            break
        x = yam._conv2d(x, jnp.asarray(params[f'{key}/kernel']), stride,
                        depthwise=(kind == 'depthwise'))
        x = jax.nn.relu(x + params[f'{key}/bias'])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_tail(params, x, start_layer=8,
                                    block_patches=4, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def _bundle_arrays(seed=6, n_classes=3):
    from buzzdetect_tpu.models.heads import init_head
    folded = yam.fold_batchnorm(yam.init_raw_params(seed=seed))
    arrays = {f'yamnet/{k}': v for k, v in folded.items()}
    arrays.update(init_head(1024, n_classes, seed=seed))
    return arrays


def test_classifier_conv_pallas_matches_xla():
    """ChunkClassifier(conv='pallas') scores match conv='xla' on the single,
    batch, and embed paths (interpreter mode on CPU)."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    arrays = _bundle_arrays()
    wav = (RNG.standard_normal(int(3.0 * 16000)) * 0.1).astype(np.float32)
    wav2 = (RNG.standard_normal(int(3.0 * 16000)) * 0.1).astype(np.float32)

    ref_cls = ChunkClassifier(arrays, framehop_prop=1.0, conv='xla')
    pl_cls = ChunkClassifier(arrays, framehop_prop=1.0, conv='pallas')
    assert pl_cls.conv == 'pallas'

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(pl_cls.predict(wav), ref_cls.predict(wav),
                                   atol=1e-4)
        got_b, nv = pl_cls.predict_async_batch([wav, wav2])
        ref_b, _ = ref_cls.predict_async_batch([wav, wav2])
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                                   atol=1e-4)
        np.testing.assert_allclose(pl_cls.embed(wav), ref_cls.embed(wav),
                                   atol=1e-4)


def test_conv_auto_resolution_rule():
    """'auto' picks the fused kernels only on TPU + f32 + unsharded; bf16
    stays XLA (measured regression: the kernels' f32 VPU depthwise work
    dominates once XLA's matmuls run 1-pass bf16)."""
    from buzzdetect_tpu.models.classifier import resolve_conv_auto
    assert resolve_conv_auto(True, jnp.float32) == 'pallas'
    assert resolve_conv_auto(True, jnp.bfloat16) == 'xla'
    assert resolve_conv_auto(False, jnp.float32) == 'xla'
    assert resolve_conv_auto(True, jnp.float32, mesh=object()) == 'xla'
    assert resolve_conv_auto(True, jnp.float32, sharding=object()) == 'xla'


def test_execution_target_rule():
    """conv='auto' must judge the device the graphs will EXECUTE on: a
    device= pin or an ambient jax.default_device(cpu) overrides the mere
    presence of a TPU in jax.devices() (regression: the numerics probe's
    CPU-reference classifier resolved to the fused kernel and crashed)."""
    from types import SimpleNamespace
    from buzzdetect_tpu.models.classifier import _execution_target_is_tpu
    fake_tpu = SimpleNamespace(platform='tpu')
    fake_cpu = SimpleNamespace(platform='cpu')
    # device pin wins over the device list
    assert _execution_target_is_tpu(fake_cpu, devices=[fake_tpu]) is False
    assert _execution_target_is_tpu(fake_tpu, devices=[fake_cpu]) is True
    # ambient default_device(cpu) wins over a TPU in the list
    with jax.default_device(jax.devices('cpu')[0]):
        assert _execution_target_is_tpu(devices=[fake_tpu]) is False
    # no pin, no ambient default: the device list decides
    assert _execution_target_is_tpu(devices=[fake_tpu, fake_cpu]) is True
    assert _execution_target_is_tpu(devices=[fake_cpu]) is False
    # jax accepts a platform STRING for jax_default_device (regression:
    # `target.platform` raised AttributeError on str, crashing every
    # default-construction under that config)
    with jax.default_device('cpu'):
        assert _execution_target_is_tpu(devices=[fake_tpu]) is False


def test_conv_auto_compile_failure_falls_back_to_xla(monkeypatch):
    """Mosaic constraints vary across TPU generations/toolchains: if the
    AUTO-resolved fused conv fails to compile at first dispatch, conv=auto
    must degrade to the XLA stack with a warning — the product must not
    crash. An EXPLICIT conv='pallas' still fails loudly."""
    import warnings
    from buzzdetect_tpu.models import classifier as clf_mod

    real = clf_mod._classify_padded

    def fake(params, wav, cfg, compute_dtype=jnp.float32, mesh=None,
             frontend='xla', conv='xla', *a):
        if conv == 'pallas':
            raise RuntimeError('Mosaic failed to compile (simulated)')
        return real(params, wav, cfg, compute_dtype, mesh, frontend,
                    conv, *a)

    monkeypatch.setattr(clf_mod, '_classify_padded', fake)
    arrays = _bundle_arrays()
    clf = clf_mod.ChunkClassifier(arrays, framehop_prop=1.0)
    clf._conv_auto, clf.conv = True, 'pallas'  # as on a TPU backend
    clf.conv_precision = 'highest'             # the pallas-path auto value
    wav = np.zeros(int(2 * 0.96 * 16000) + 240, np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        out, n_valid = clf.predict_async(wav)
    assert np.asarray(out).shape[1] == 3 and n_valid == 2
    assert clf.conv == 'xla'
    # the per-path AUTO precision follows the flip: the XLA path's
    # measured-default is 'high' (the docs promise fallbacks run it)
    assert clf.conv_precision == 'high'
    assert any('falling back' in str(x.message) for x in w)

    # an EXPLICIT 'highest' (--strict_f32) must survive the flip
    clf_strict = clf_mod.ChunkClassifier(arrays, framehop_prop=1.0,
                                         conv_precision='highest')
    clf_strict._conv_auto, clf_strict.conv = True, 'pallas'
    with warnings.catch_warnings(record=True):
        warnings.simplefilter('always')
        clf_strict.predict_async(wav)
    assert clf_strict.conv == 'xla'
    assert clf_strict.conv_precision == 'highest'

    # explicit pallas: no silent substitution
    clf2 = clf_mod.ChunkClassifier(arrays, framehop_prop=1.0)
    clf2._conv_auto, clf2.conv = False, 'pallas'
    with pytest.raises(RuntimeError, match='simulated'):
        clf2.predict_async(wav)


def test_classifier_conv_validation():
    """'auto' resolves to 'xla' off-TPU; explicit 'pallas' + mesh/sharding
    fails loudly (GSPMD cannot partition the fused kernel); bad names
    rejected."""
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    from buzzdetect_tpu.parallel.mesh import make_mesh
    arrays = _bundle_arrays()

    assert ChunkClassifier(arrays).conv == 'xla'  # CPU backend under tests

    with pytest.raises(ValueError, match='conv must be'):
        ChunkClassifier(arrays, conv='fused')

    mesh = make_mesh()
    with pytest.raises(ValueError, match='mesh'):
        ChunkClassifier(arrays, conv='pallas', mesh=mesh)
    # auto + mesh quietly stays on the portable path
    assert ChunkClassifier(arrays, mesh=mesh).conv == 'xla'


# --- packed front block (layers 2-3) -----------------------------------------
# Ships by default (yamnet.PALLAS_FRONT, fuse_mid variant): a small,
# stable +1-2.5% full-graph win under the long-run wall method — far
# below the 1.15x the round-3 verdict targeted, because the front is
# MXU-precision-bound (docs/tuning.md round-4 front-block ceiling).
# BUZZDETECT_PALLAS_FRONT='off' disables it.

def xla_front(params, patches):
    """Reference: layers 1-3 through the production XLA path."""
    x = jnp.asarray(patches)[..., None]
    for key, kind, stride, _shape in yam._conv_shapes():
        if int(key.split('/')[0][len('layer'):]) >= 4:
            break
        k = jnp.asarray(params[f'{key}/kernel'])
        b = jnp.asarray(params[f'{key}/bias'])
        x = yam._conv2d(x, k, stride, depthwise=(kind == 'depthwise'))
        x = jax.nn.relu(x + b)
    return x


@pytest.mark.parametrize('b', [1, 3, 8])
def test_fused_front_matches_xla(b):
    """packed_l1 + fused_front == XLA layers 1-3, including ragged
    batches that pad to a group multiple."""
    from buzzdetect_tpu.ops.pallas_conv import fused_front
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    patches = RNG.standard_normal((b, 96, 64)).astype(np.float32)
    ref = np.asarray(xla_front(params, patches)).reshape(b, 24 * 16, 128)
    with pltpu.force_tpu_interpret_mode():
        xp = yam.packed_l1(params, jnp.asarray(patches)[..., None], 4)
        got = np.asarray(fused_front(params, xp, groups=4, block_packed=1,
                                     interpret=True))[:b]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_fused_front_tail_matches_xla():
    """The fuse-through variant (packed 2-3 + in-kernel un-interleave +
    plain 4-7) matches XLA layers 1-7."""
    from buzzdetect_tpu.ops.pallas_conv import fused_front
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    b = 5
    patches = RNG.standard_normal((b, 96, 64)).astype(np.float32)
    x = xla_front(params, patches)
    ref = np.asarray(xla_tail(params, x, 4, 8, gap=False))
    ref = ref.reshape(b, -1, ref.shape[-1])
    with pltpu.force_tpu_interpret_mode():
        xp = yam.packed_l1(params, jnp.asarray(patches)[..., None], 4)
        got = np.asarray(fused_front(params, xp, groups=4,
                                     block_packed=1, plain_through=8,
                                     interpret=True))[:b]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.parametrize('front', [
    dict(groups=4, block_packed=1),
    dict(groups=4, block_packed=1, fuse_mid=True),
])
def test_embed_with_front_config_matches_xla(front, monkeypatch):
    """Whole-embed parity with the front knob enabled, both variants."""
    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    patches = RNG.standard_normal((6, 96, 64)).astype(np.float32)
    ref = np.asarray(yam.embed(params, jnp.asarray(patches), conv='xla'))
    monkeypatch.setattr(yam, 'PALLAS_FRONT', front)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(yam.embed(params, jnp.asarray(patches),
                                   conv='pallas'))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_front_pw_splits_rule():
    """Sub-dot counts follow the g*C<=128 rule: one block-diagonal dot
    while the packed K fits a single MXU pass, dense-K splits beyond."""
    from buzzdetect_tpu.ops.pallas_conv import front_pw_splits
    assert front_pw_splits(4) == (1, 2)     # L2: 4*32=128; L3: 4*64=256
    assert front_pw_splits(2) == (1, 1)     # 64 and 128: single dots
    assert front_pw_splits(8) == (2, 4)     # 256 and 512


def test_front_env_knob_parsing():
    """BUZZDETECT_PALLAS_FRONT parses 'g:pbi[:mid]' and fails loudly on
    typos (silent fallback would un-apply the operator's experiment)."""
    import os

    from buzzdetect_tpu.models.yamnet import _front_from_env

    default = object()

    def with_env(val):
        old = os.environ.get('BUZZDETECT_PALLAS_FRONT')
        try:
            if val is None:
                os.environ.pop('BUZZDETECT_PALLAS_FRONT', None)
            else:
                os.environ['BUZZDETECT_PALLAS_FRONT'] = val
            return _front_from_env(default)
        finally:
            if old is None:
                os.environ.pop('BUZZDETECT_PALLAS_FRONT', None)
            else:
                os.environ['BUZZDETECT_PALLAS_FRONT'] = old

    assert with_env(None) is default          # unset -> shipped default
    assert with_env('') is default
    assert with_env('off') is None            # forced all-XLA front
    assert with_env('4:1') == dict(groups=4, block_packed=1)
    assert with_env('4:2:mid') == dict(groups=4, block_packed=2,
                                       fuse_mid=True)
    for bad in ('4', 'four:1', '4:1:fuse', '4:1:mid:x'):
        with pytest.raises(ValueError):
            with_env(bad)


def test_malformed_front_env_fails_at_model_init_not_import():
    """A typo'd BUZZDETECT_PALLAS_FRONT must NOT take down module import
    (doctor/GUI — the tools you'd use to diagnose it — import yamnet);
    the loud failure belongs at model init, naming the knob. A fresh
    interpreter is the only honest way to test import-time behavior."""
    import os
    import subprocess
    import sys

    code = (
        'from buzzdetect_tpu.models import yamnet\n'            # imports OK
        'from buzzdetect_tpu.models.classifier import ChunkClassifier\n'
        'import numpy as np\n'
        'arrays = {"yamnet/layer1/conv/kernel": '
        'np.zeros((3,3,1,32), np.float32)}\n'
        'try:\n'
        '    ChunkClassifier(arrays, conv="pallas")\n'
        'except ValueError as e:\n'
        '    assert "BUZZDETECT_PALLAS_FRONT" in str(e), e\n'
        '    print("INIT_RAISED")\n'
        'else:\n'
        '    raise SystemExit("classifier init accepted a malformed knob")\n')
    env = {**os.environ, 'BUZZDETECT_PALLAS_FRONT': 'typo!!',
           'JAX_PLATFORMS': 'cpu'}
    r = subprocess.run([sys.executable, '-c', code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert 'INIT_RAISED' in r.stdout
