"""Precision -> activation-threshold calibration.

Parity with reference `src/write/thresholds.py:29-41`: pick the mean threshold
of all rows in the model's evaluation metrics whose precision lies within
± tolerance/2 of the requested precision. The metrics table itself is produced
by the evaluation harness (`buzzdetect_tpu.train.evaluate`) — a capability the
reference ships only as a data artifact.
"""

import os

import numpy as np

from buzzdetect_tpu import config as cfg


def load_metrics(modelname: str):
    """Load the (threshold, precision, sensitivity, fpr) table for a model.

    Looks for ``tests/metrics.csv`` in the model directory, falling back to a
    ``metrics`` array packed inside the model's artifact bundle (``model.npz``).
    Returns a dict of 1-D float arrays.
    """
    dir_model = os.path.join(cfg.resolve_dir(cfg.DIR_MODELS), modelname)
    path_csv = os.path.join(dir_model, cfg.SUBDIR_TESTS, cfg.FNAME_METRICS)
    if os.path.exists(path_csv):
        data = np.genfromtxt(path_csv, delimiter=',', names=True)
        return {name: np.asarray(data[name], dtype=np.float64)
                for name in data.dtype.names}

    path_npz = os.path.join(dir_model, 'model.npz')
    if os.path.exists(path_npz):
        with np.load(path_npz) as z:
            if 'metrics_threshold' in z:
                return {
                    'threshold': z['metrics_threshold'].astype(np.float64),
                    'precision': z['metrics_precision'].astype(np.float64),
                    'sensitivity': z['metrics_sensitivity'].astype(np.float64),
                    'fpr': z['metrics_fpr'].astype(np.float64),
                }
    raise FileNotFoundError(
        f'metrics not available for model "{modelname}"; run '
        f'buzzdetect_tpu.train.evaluate on a labeled test set to generate them')


def calculate_threshold(modelname: str, precision_requested: float,
                        tolerance: float = 0.01) -> float:
    """Mean threshold over metrics rows with |precision - requested| <= tolerance/2."""
    metrics = load_metrics(modelname)
    delta = np.abs(metrics['precision'] - precision_requested)
    mask = delta <= tolerance / 2
    if not mask.any():
        raise ValueError(
            f'no metrics rows within ±{tolerance / 2} of precision '
            f'{precision_requested}; available precision range is '
            f'[{metrics["precision"].min():.3f}, {metrics["precision"].max():.3f}]')
    return float(metrics['threshold'][mask].mean())
