"""Convenience Python API for interactive use (notebooks, scripts).

The pipeline (`analyze`) is the production path; these helpers cover the
"just score this file" cases without directories, CSVs, or worker threads.
"""

import numpy as np

from buzzdetect_tpu import config as cfg
from buzzdetect_tpu.audio import build_track, get_duration
from buzzdetect_tpu.models.registry import load_model
from buzzdetect_tpu.write.coverage import gaps_to_chunklist


def stream_scores(path_audio: str, modelname: str = None,
                  framehop_prop: float = 1.0, chunklength: float = 200.0,
                  model=None):
    """Yield ``(start_seconds, scores)`` per analysis frame of one file.

    Streams chunk by chunk — arbitrarily long recordings never materialize
    in memory. ``scores`` is a (n_classes,) float array; class order is
    ``model.config['classes']``.
    """
    if model is None:
        model = load_model(modelname or cfg.DEFAULT_MODEL,
                           framehop_prop=framehop_prop, initialize=True)
    fl = model.embedder.framelength_s
    framehop_s = model.embedder.framehop_s
    chunklength = max(round(chunklength / fl) * fl, fl)

    track = build_track(path_audio, target_rate=model.embedder.samplerate)
    try:
        duration = get_duration(track)
        rate = track.samplerate
        for t0, t1 in gaps_to_chunklist([(0.0, duration)], chunklength):
            track.seek(int(t0 * rate))
            samples = track.read(int((t1 - t0) * rate))
            if len(samples) == 0:
                return
            scores = model.predict(samples)
            for i, row in enumerate(scores):
                yield round(t0 + i * framehop_s,
                            model.embedder.digits_time), row
            if len(samples) < int((t1 - t0) * rate):
                return  # truncated audio (bad read): stop at real content
    finally:
        track.close()


def score_file(path_audio: str, modelname: str = None,
               framehop_prop: float = 1.0, chunklength: float = 200.0,
               model=None):
    """Score a whole file -> (starts (n,), scores (n, n_classes), classes)."""
    if model is None:
        model = load_model(modelname or cfg.DEFAULT_MODEL,
                           framehop_prop=framehop_prop, initialize=True)
    starts, rows = [], []
    for t, row in stream_scores(path_audio, model=model,
                                chunklength=chunklength):
        starts.append(t)
        rows.append(row)
    return (np.asarray(starts),
            np.asarray(rows) if rows else np.zeros((0, len(model.config['classes']))),
            list(model.config['classes']))
