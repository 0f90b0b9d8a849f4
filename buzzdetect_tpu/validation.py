"""Per-argument validators for ``analyze()`` parameters.

Each validator returns an ``ArgValid(valid, message)``; a message on a valid
result is a warning the UI should surface. ``validate_map`` registers one
validator per analyze() kwarg so front-ends (GUI/TUI, notebooks) can validate
fields individually.

Parity: reference `src/validation.py:8-184` (same semantics, including the
precision < 0.9 false-positive warning and the framehop > 1 gap warning).
"""

import numbers
import os

from buzzdetect_tpu import config as cfg
from buzzdetect_tpu.loglevels import loglevels


class ArgValid:
    def __init__(self, valid: bool, message: str = None):
        self.valid = valid
        self.message = message

    def __repr__(self):
        return f'ArgValid(valid={self.valid}, message={self.message!r})'


def validate_modelname(modelname: str):
    modelname = str(modelname)
    dir_model = os.path.join(cfg.resolve_dir(cfg.DIR_MODELS), modelname)
    if not os.path.isdir(dir_model):
        return ArgValid(False, f'Model folder does not exist for model "{modelname}"')
    if not os.path.exists(os.path.join(dir_model, 'config_model.json')):
        return ArgValid(False, f'Config file does not exist for model "{modelname}"')
    has_plugin = os.path.exists(os.path.join(dir_model, 'model.py'))
    has_weights = os.path.exists(os.path.join(dir_model, 'model.npz'))
    if not (has_plugin or has_weights):
        return ArgValid(False, f'Neither model.py nor model.npz found for model "{modelname}"')
    return ArgValid(True, None)


def validate_classes_out(classes_out):
    if classes_out == 'all':
        return ArgValid(True, None)
    if not isinstance(classes_out, list):
        return ArgValid(False, 'must be a list')
    if any(not isinstance(c, str) for c in classes_out):
        return ArgValid(False, 'must be a list of strings')
    return ArgValid(True, None)


def validate_precision(precision):
    if precision is None:
        return ArgValid(True, None)
    try:
        precision = float(precision)
    except (TypeError, ValueError):
        return ArgValid(False, 'must be numeric')
    if precision <= 0:
        return ArgValid(False, 'must be > 0')
    if precision >= 1:
        return ArgValid(False, 'must be < 1')
    if precision < 0.9:
        return ArgValid(True, 'analyses with precision < 0.9 are likely to be '
                              'prone to false positives')
    return ArgValid(True, None)


FRAMEHOP_WARNING = (
    'Currently, analyses with framehop > 1 will produce valid results, but '
    'buzzdetect will interpret the resulting gaps as missing data.\n'
    f'Fully analyzed files will not be converted from {cfg.SUFFIX_RESULT_PARTIAL} '
    f'to {cfg.SUFFIX_RESULT_COMPLETE}.\n'
    'Repeated analysis will attempt to fill gaps between frames.')


def validate_framehop(framehop_prop):
    try:
        framehop_prop = float(framehop_prop)
    except (TypeError, ValueError):
        return ArgValid(False, 'must be numeric')
    if framehop_prop <= 0:
        return ArgValid(False, 'must be > 0')
    if framehop_prop > 1:
        return ArgValid(True, FRAMEHOP_WARNING)
    return ArgValid(True, None)


def validate_chunklength(chunklength_s):
    try:
        chunklength_s = float(chunklength_s)
    except (TypeError, ValueError):
        return ArgValid(False, 'must be numeric')
    if chunklength_s <= 0:
        return ArgValid(False, 'must be > 0')
    return ArgValid(True, None)


def validate_int(value, none_ok: bool, value_min=None, value_max=None):
    if value is None:
        return ArgValid(True, None) if none_ok else ArgValid(False, 'cannot be None')
    if not isinstance(value, int):
        try:
            value = int(value)
        except (TypeError, ValueError):
            return ArgValid(False, 'must be an integer')
    if not isinstance(value, numbers.Number):
        return ArgValid(False, 'must be numeric')
    if value_min is not None and value < value_min:
        return ArgValid(False, f'must be >= {value_min}')
    if value_max is not None and value > value_max:
        return ArgValid(False, f'must be <= {value_max}')
    return ArgValid(True, None)


def validate_analyzers_cpu(n):
    return validate_int(n, none_ok=False, value_min=0)


def validate_analyzers_gpu(n):
    return validate_int(n, none_ok=False, value_min=0)


def validate_n_streamers(n):
    return validate_int(n, none_ok=True, value_min=0)


def validate_stream_buffer_depth(n):
    return validate_int(n, none_ok=True, value_min=0)


def validate_dir_audio(dir_audio: str):
    if not os.path.exists(dir_audio):
        return ArgValid(False, f'folder does not exist: {dir_audio!r}')
    return ArgValid(True, None)


def validate_dir_out(dir_out):
    if dir_out is not None and not os.path.exists(dir_out):
        return ArgValid(True, 'Output folder does not exist; it will be created '
                              'upon analysis')
    return ArgValid(True, None)


def validate_verbosity(verbosity_str: str):
    if verbosity_str not in loglevels:
        return ArgValid(False, f"must be one of: {', '.join(loglevels)}")
    return ArgValid(True, None)


def validate_log_progress(log_progress):
    return validate_int(log_progress, none_ok=False, value_min=0, value_max=1)


validate_map = {
    'modelname': validate_modelname,
    'classes_out': validate_classes_out,
    'precision': validate_precision,
    'framehop_prop': validate_framehop,
    'chunklength': validate_chunklength,
    'analyzers_cpu': validate_analyzers_cpu,
    'analyzers_gpu': validate_analyzers_gpu,
    'n_streamers': validate_n_streamers,
    'stream_buffer_depth': validate_stream_buffer_depth,
    'dir_audio': validate_dir_audio,
    'dir_out': validate_dir_out,
    'verbosity_print': validate_verbosity,
    'verbosity_log': validate_verbosity,
    'log_progress': validate_log_progress,
}
